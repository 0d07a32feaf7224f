"""A/B probe: tap vs prefix-XOR vs rotate-after-select aaHash on the
device, in-pipeline graphs (round 5 adds --variant rotsel, VERDICT r4
task 4: ONE 32-way seed select per position + fixed srol1 rotations —
no per-tap select tree, no variable rotation, no scan).

VERDICT round-3 task 1: the prefix-XOR reformulation
(aahash_jax._windowed_hash_aa_prefix) is bit-exact-tested but shipped
dark because round 3's *standalone* 6.4M-window hash graphs stalled the
tunneled remote compiler. This probe measures the PRODUCTION kernels
instead (the same jitted graphs the sketch pipeline dispatches):

- ``--mode kernel``: the wide exact-group kernel
  (aa_hash_bin_kernel_devmask) — the 64 x 100k-aa `inverted build` shape
  routes here (density > 1/8 makes it ineligible for the fast kernel).
- ``--mode multik``: the fused multi-k prefilter kernel
  (multik_aa_hash_bin_kernel) — the 16 x 1M-aa proteome shape routes here.
- ``--mode e2e``: DeviceAaSketchBackend.sketch_aa_streams wall clock,
  toggling SKETCHTPU_AA_HASH in-process (read per dispatch).

Timing is the established honest protocol (bench/probe_knn_confirm.py):
an N-iteration salt-chained fori_loop forcing one scalar fetch, minus a
1-iteration chain, cancelling the tunnel RTT; inputs salted per
iteration because the tunneled runtime memoizes identical executions.
Run one (mode, variant) per process under `timeout` — first compiles via
the tunnel are slow and occasionally stall; the persistent cache makes
re-runs fast.

ROUND-5 RESULTS — rotate-after-select (rotsel) measured, same protocol,
same session taps re-baseline; the AA-hash formulation question is now
CLOSED with three measured variants:

  kernel  8x100k-aa nk=3   taps 36.2  rotsel 36.2 Maa*k/s   (dead tie)
  multik  4x250k-aa nk=3   taps 37.2  rotsel 35.0 Maa*k/s   (rotsel -6%)

Why the ~3x op-count model fails AGAIN: the multik taps step's 32-way
select tree is fixed-shift/XOR soup the VPU pipelines with slack, while
rotsel's pre-selected r stream adds 8 B/position of real HBM traffic
per step (vs the 4 B code read the select needs) — the chain is bound
by the shared mod/mask/bin-min-sort stages, not the hash stage, so
cutting hash ops buys nothing and the extra bandwidth costs. Default
stays taps by measurement; rotsel remains a fuzz-pinned opt-in
(SKETCHTPU_AA_HASH=rotsel) like prefix.

ROUND-4 RESULTS (v5e, chip idle, this protocol) — prefix LOSES at every
compilable shape and the default stays taps:

  kernel  8x100k-aa  taps 39.8  prefix 34.8 Maa*k/s   (prefix -13%)
  multik  4x250k-aa  taps 37.4  prefix 33.9 Maa*k/s   (prefix -10%,
          and multik shares the prefix scans across k — the best case)
  kernel  1x100k-aa  prefix 45.5 (overhead-bound tiny shape)
  taps production-shape baselines: kernel 64x100k 55.1; multik 16x1M 88.3

Prefix compile time explodes with stream bucket even with the blocked
two-level scan (2^17 ~6 min, 2^20 ~15 min, 2^23 >35 min unfinished);
taps compiles in minutes at every size. Diagnosis in
sketch_aa_jax._aa_prefix_hash's docstring.

Reference hot loop being modelled: aahash_iterator.rs:25-218.
"""

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketchtpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from sketchtpu.constants import num_bins as num_bins_fn  # noqa: E402
from sketchtpu.hash.aahash_jax import (  # noqa: E402
    aa_hash_bin_kernel_devmask,
    aa_tap_tables_u32,
)
from sketchtpu.hash.aahash_multik import (  # noqa: E402
    aa_seed_row_u32,
    multik_aa_hash_bin_kernel,
)
from sketchtpu.hash.nthash_multik import (  # noqa: E402
    group_thresholds,
    pick_block_geometry,
)
from sketchtpu.sketchcore.sketch_jax import (  # noqa: E402
    _bucket_size,
    _exact_rows,
    bin_magic,
)

LEVEL = 1


def make_stream(n, length, seed):
    """(codes, starts, total, n_pad): n samples of `length` valid codes
    concatenated, exactly as sketch_aa_jax.prepare() lays them out."""
    from sketchtpu.hash.nthash_jax import MAX_K

    rng = np.random.default_rng(seed)
    total = n * length
    n_pad = _bucket_size(total + MAX_K)
    codes = np.zeros(n_pad, dtype=np.uint8)
    codes[:total] = rng.integers(0, 20, total, dtype=np.uint8)
    starts = np.arange(n, dtype=np.int32) * length
    return codes, starts, total, n_pad


def timeit(chain, inner, trials=3):
    float(chain(jnp.uint32(0), 1))
    float(chain(jnp.uint32(0), inner))
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        float(chain(jnp.uint32(1 + t), 1))
        t1 = time.perf_counter()
        float(chain(jnp.uint32(64 + t), inner))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (inner - 1))
    return best


def salt_codes(codes, s):
    # keep codes valid (0..19) so emission masks stay realistic; padding
    # past `total` never emits (iota < total in the device mask)
    return ((codes.astype(jnp.uint32) + (s % 19)) % 20).astype(jnp.uint8)


def run_kernel(n, length, kmers, variant, inner, sketch_size):
    sketchsize64, nbins, _ = num_bins_fn(sketch_size)
    rows = _exact_rows(n)
    codes, starts, total, n_pad = make_stream(n, length, 0)
    starts_pad = np.full(rows, total, dtype=np.int32)
    starts_pad[:n] = starts
    codes_d = jax.device_put(codes)
    tabs = [
        aa_tap_tables_u32(kk, LEVEL) if variant == "taps"
        else aa_seed_row_u32(LEVEL)
        for kk in kmers
    ]
    magic = bin_magic(nbins)

    @functools.partial(jax.jit, static_argnames=("inner",))
    def chain(salt, inner):
        def body(_, s):
            c2 = salt_codes(codes_d, s)
            acc = jnp.uint32(0)
            for kk, tab in zip(kmers, tabs):
                mh, ml, fd, cnt = aa_hash_bin_kernel_devmask(
                    c2,
                    starts_pad,
                    jnp.int32(kk),
                    tab,
                    jnp.int32(total),
                    num_bins=nbins,
                    magic=magic,
                    out_rows=rows,
                    variant=variant,
                )
                acc ^= (
                    mh.sum().astype(jnp.uint32)
                    ^ ml.sum().astype(jnp.uint32)
                    ^ fd.sum().astype(jnp.uint32)
                    ^ cnt.sum().astype(jnp.uint32)
                )
            return (acc ^ jnp.uint32(1)) + s * 0

        return jax.lax.fori_loop(0, inner, body, salt)

    dt = timeit(chain, inner)
    rate = n * length * len(kmers) / dt / 1e6
    print(
        f"exact-wide kernel {n}x{length} nk={len(kmers)} "
        f"variant={variant}: {dt*1e3:.1f} ms/iter -> {rate:.1f} Maa*k/s",
        flush=True,
    )
    return rate


def run_multik(n, length, kmers, variant, inner, sketch_size):
    from sketchtpu.sketchcore.sketch_jax import _MAX_GROUP_FAST

    sketchsize64, nbins, _ = num_bins_fn(sketch_size)
    codes, starts, total, n_pad = make_stream(n, length, 0)
    lengths = [length] * n + [10**12] * (_MAX_GROUP_FAST - n)
    t_lo, t_hi, eligible, max_density = group_thresholds(lengths, nbins)
    if not eligible:
        print(f"shape {n}x{length} not eligible for the fast kernel")
        return None
    blk, w = pick_block_geometry(max_density)
    starts_pad = np.full(_MAX_GROUP_FAST, total, dtype=np.int32)
    starts_pad[:n] = starts
    codes_d = jax.device_put(codes)
    seed_row = aa_seed_row_u32(LEVEL)
    dummy = np.zeros((len(kmers), 1), dtype=np.uint8)
    magic = bin_magic(nbins)

    @functools.partial(jax.jit, static_argnames=("inner",))
    def chain(salt, inner):
        def body(_, s):
            c2 = salt_codes(codes_d, s)
            o_hi, o_lo, fd, ovf, cnt = multik_aa_hash_bin_kernel(
                c2,
                dummy,
                starts_pad,
                t_lo,
                t_hi,
                seed_row,
                kmers=tuple(kmers),
                num_bins=nbins,
                magic=magic,
                out_rows=_MAX_GROUP_FAST,
                blk=blk,
                w=w,
                total=jnp.int32(total),
                device_mask=True,
                variant=variant,
            )
            acc = (
                o_hi.sum().astype(jnp.uint32)
                ^ o_lo.sum().astype(jnp.uint32)
                ^ fd.sum().astype(jnp.uint32)
                ^ ovf.astype(jnp.uint32)
                ^ cnt.sum().astype(jnp.uint32)
            )
            return (acc ^ jnp.uint32(1)) + s * 0

        return jax.lax.fori_loop(0, inner, body, salt)

    dt = timeit(chain, inner)
    rate = n * length * len(kmers) / dt / 1e6
    print(
        f"multik kernel {n}x{length} nk={len(kmers)} blk={blk} w={w} "
        f"variant={variant}: {dt*1e3:.1f} ms/iter -> {rate:.1f} Maa*k/s",
        flush=True,
    )
    return rate


def run_e2e(n, length, kmers, variant, sketch_size):
    import os

    from sketchtpu.constants import SEQSEP
    from sketchtpu.ingest.fastx import AaStream
    from sketchtpu.sketchcore.sketch_aa_jax import DeviceAaSketchBackend

    os.environ["SKETCHTPU_AA_HASH"] = variant
    AAS = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8).copy()
    backend = DeviceAaSketchBackend()
    names = [f"p{i}" for i in range(n)]
    best = None
    for rep in range(3):
        rng = np.random.default_rng(rep)
        streams = [
            AaStream(seq=np.append(AAS[rng.integers(0, 20, length)], np.uint8(SEQSEP)))
            for _ in range(n)
        ]
        t0 = time.perf_counter()
        sk = backend.sketch_aa_streams(streams, names, kmers, sketch_size, LEVEL, True)
        dt = time.perf_counter() - t0
        assert len(sk) == n and sk[0].usigs.size
        best = dt if best is None else min(best, dt)
    rate = n * length * len(kmers) / best / 1e6
    print(
        f"e2e {n}x{length} nk={len(kmers)} {variant}: "
        f"{best:.2f} s best-of-3 -> {rate:.1f} Maa*k/s",
        flush=True,
    )
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["kernel", "multik", "e2e"], required=True)
    ap.add_argument(
        "--variant", choices=["taps", "prefix", "rotsel"], required=True
    )
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--len", dest="length", type=int, default=100_000)
    ap.add_argument("--kmers", default="6,9,12")
    ap.add_argument("--inner", type=int, default=5)
    ap.add_argument("-s", "--sketch-size", type=int, default=1000)
    a = ap.parse_args()
    kmers = [int(x) for x in a.kmers.split(",")]
    if a.mode == "kernel":
        run_kernel(a.n, a.length, kmers, a.variant, a.inner, a.sketch_size)
    elif a.mode == "multik":
        run_multik(a.n, a.length, kmers, a.variant, a.inner, a.sketch_size)
    else:
        run_e2e(a.n, a.length, kmers, a.variant, a.sketch_size)


if __name__ == "__main__":
    main()


