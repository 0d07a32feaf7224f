"""Measured full-schedule 661k inverted-index workloads (VERDICT r4
task 3): until round 5 the repo's flagship numbers against the
reference's only published figure (~90 min / 50 GB for the 661k
`precluster --count` pair enumeration on 32 CPU threads,
/root/reference/src/lib.rs:702-703) were a round-1 wall (~45 s,
pre-512x512-kernels, pre-best-of-3 protocol) and tile-rate arithmetic
for the masked kNN scan ("~3.2 min device compute"). This probe gives
both the round-4 treatment: the REAL production schedules executed on
one chip, everything device-resident, checksum sink, best-of-3 salted,
chip idle.

  count  the `precluster --count` pair enumeration: 4096-row strips x
         4096-column tiles of the S=100 sign-equality any-reduce
         (inverted/device.py _match_count_strip semantics: eq-any +
         upper-triangle/i<j mask + per-tile int32 count), tri skip per
         tile, all strips driven by one lax.scan, one scalar out.
MEASURED NEGATIVE (round 5, code deleted after measurement per house
rule): a dedicated Pallas eq-any count kernel — grid over (512, 512)
blocks, the eq-any accumulator entirely in vregs, per-row-block
(8, 128) VMEM count accumulators, tri/range skip in-kernel — measured
25.59/25.60/25.61 s best-of-3 for 0.219 T computed pairs (8.56 G
pair/s) vs the XLA schedule's 24.39 s / 9.08 G pair/s: the XLA fusion
never materializes the (tile x tile x S) equality intermediate either,
and the opaque kernel loses the fusion of the count consumer. Same
lesson as the samebits "4.87" and the kNN mask "15 G" figures: XLA
reduce-fused rates are not beatable by re-implementing the same
data flow in Mosaic.

  knn    the `precluster` masked kNN scan: the PRODUCTION
         _knn_scan_block_packed(masked=True, pallas=True) — 512x512
         Pallas samebits blocks inside 8192-column tiles, sign-equality
         prefilter fused into the validity mask, packed int32 keys,
         running top-k — over 2048-row blocks; per-block (vals, idxs)
         reduce to a checksum on device.

Shapes: n = 661,000 real samples (matching lib.rs:702-703), padded to
663,552 (81 x 8192) columns / 4096- or 2048-row multiples; S = 100
u16-truncated signs; sketch planes s64 = 16 (s = 1000). Rates
normalise by the pairs each schedule actually computes; the implied
exact-661k figure is printed alongside.
"""

import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketchtpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from sketchtpu.dist.knn_jax import _knn_scan_block_packed  # noqa: E402
from sketchtpu.dist.pallas_kernels import chunk_group_major  # noqa: E402

S64 = 16
S = 100  # inverted sketch_size (u16 signs)
KNN = 50
N_REAL = int(os.environ.get("PROBE_N_REAL", "661000"))
CTILE = int(os.environ.get("PROBE_CTILE", "4096"))  # count strip/tile
KROWS = int(os.environ.get("PROBE_KROWS", "2048"))  # production row_tile
KCOLS = int(os.environ.get("PROBE_KCOLS", "8192"))  # production col_tile
INTERP = os.environ.get("PROBE_INTERPRET") == "1"


def _pad_to(n, m):
    return n + (-n) % m


def tri_pairs_count(n_pad: int, n_real: int, t: int) -> int:
    """Pairs the count schedule's eq-any actually evaluates: every
    (t x t) tile not skipped computes all t*t lane pairs (the i<j /
    bounds masks are applied to the reduce, not the compute)."""
    total = 0
    for r0 in range(0, n_pad, t):
        for j0 in range(0, n_pad, t):
            if j0 + t > r0:  # the schedule's skip predicate
                total += t * t
    return total


def run_count(results):
    n_pad = _pad_to(N_REAL, CTILE)
    m = jax.random.randint(
        jax.random.PRNGKey(0), (n_pad, S), 0, 1 << 16, dtype=jnp.int32
    )
    m.block_until_ready()

    @functools.partial(jax.jit, static_argnames=("nblk",))
    def schedule(salt, nblk, m=None):
        n_tiles = n_pad // CTILE

        def strip(carry, bi):
            r0 = bi * CTILE
            a = jax.lax.dynamic_slice(m, (r0, 0), (CTILE, S)) ^ salt

            def tile_count(j0):
                b = jax.lax.dynamic_slice(m, (j0, 0), (CTILE, S)) ^ salt
                eq = (a[:, None, :] == b[None, :, :]).any(axis=2)
                ri = r0 + jax.lax.broadcasted_iota(
                    jnp.int32, (CTILE, CTILE), 0
                )
                ci = j0 + jax.lax.broadcasted_iota(
                    jnp.int32, (CTILE, CTILE), 1
                )
                keep = eq & (ri < N_REAL) & (ci < N_REAL) & (ci > ri)
                return jnp.sum(keep, dtype=jnp.int32)

            def tbody(tcarry, t):
                j0 = t * CTILE
                add = jax.lax.cond(
                    j0 + CTILE > r0, tile_count, lambda _: jnp.int32(0), j0
                )
                return tcarry + add, None

            cs, _ = jax.lax.scan(
                tbody, jnp.int32(0),
                jnp.arange(n_tiles, dtype=jnp.int32),
            )
            return carry + cs, None

        total, _ = jax.lax.scan(
            strip, jnp.int32(0), jnp.arange(nblk, dtype=jnp.int32)
        )
        return total

    nblk = n_pad // CTILE
    int(schedule(jnp.int32(0), 1, m))
    int(schedule(jnp.int32(0), nblk, m))
    pairs = tri_pairs_count(n_pad, N_REAL, CTILE)
    best, trials = float("inf"), []
    for t in range(3):
        t0 = time.perf_counter()
        int(schedule(jnp.int32(1 + t), 1, m))
        t1 = time.perf_counter()
        int(schedule(jnp.int32(64 + t), nblk, m))
        t2 = time.perf_counter()
        trials.append(round(t2 - t1, 3))
        print(
            f"  count trial {t}: full {t2-t1:.2f} s, 1-strip {t1-t0:.2f} s",
            flush=True,
        )
        best = min(best, t2 - t1)
    rate = pairs / best
    exact_pairs = N_REAL * (N_REAL - 1) / 2
    implied = exact_pairs / rate
    print(
        f"precluster --count FULL SCHEDULE n={N_REAL} (S={S}): "
        f"{best:.2f} s best-of-3 for {pairs/1e12:.3f} T computed pairs -> "
        f"{rate/1e9:.2f} G pair/s; implied exact-661k triangle "
        f"({exact_pairs/1e12:.3f} T pairs): {implied:.1f} s",
        flush=True,
    )
    results["count"] = {
        "trials_full_s": trials,
        "best_full_s": round(best, 3),
        "computed_pairs": pairs,
        "rate_gpairs_s": round(rate / 1e9, 3),
        "implied_exact_s": round(implied, 2),
        "vs_reference_x": round(90 * 60 / implied, 0),
    }


def run_knn(results):
    n_pad = _pad_to(N_REAL, KCOLS)
    nrb = _pad_to(N_REAL, KROWS) // KROWS  # row blocks over real rows
    mat = jax.random.bits(
        jax.random.PRNGKey(1), (n_pad, S64 * 28), dtype=jnp.uint32
    )
    cm = chunk_group_major(mat, S64)
    cm_t = jnp.transpose(cm)
    sig = jax.random.randint(
        jax.random.PRNGKey(2), (n_pad, S), 0, 1 << 16, dtype=jnp.int32
    )
    cm.block_until_ready()
    del mat

    # the full 324-block schedule is a single ~3 min device program,
    # which crashed the TPU worker (watchdog/heartbeat) on the first
    # attempt — dispatch the scan in CHUNK-block pieces (~30 s each)
    # instead; the summed wall adds ~0.3 s of tunnel RTT per piece,
    # <1% of the total, and stays conservative
    CHUNK = int(os.environ.get("PROBE_KCHUNK", "32"))

    @functools.partial(jax.jit, static_argnames=("nblk",))
    def schedule_from(salt, b0, nblk, cm=None, cm_t=None, sig=None):
        def body(carry, bi):
            r0 = (b0 + bi) * KROWS
            a_blk = (
                jax.lax.dynamic_slice(cm, (r0, 0), (KROWS, cm.shape[1]))
                ^ salt
            )
            a_sig = jax.lax.dynamic_slice(sig, (r0, 0), (KROWS, S))
            v, i = _knn_scan_block_packed(
                a_blk, cm_t, r0, jnp.int32(N_REAL),
                s64=S64, knn=KNN, tc=KCOLS, exclude_self=True,
                pallas=True, a_sig=a_sig, b_sig=sig, masked=True,
                ti=512, interpret=INTERP,
            )
            return carry + v.sum(dtype=jnp.int32) + i.sum(dtype=jnp.int32), None

        cs, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(nblk, dtype=jnp.int32)
        )
        return cs

    def run_full(salt):
        total = 0
        for b0 in range(0, nrb, CHUNK):
            nb = min(CHUNK, nrb - b0)
            total += int(
                schedule_from(salt, jnp.int32(b0), nb, cm, cm_t, sig)
            )
        return total

    int(schedule_from(jnp.uint32(0), jnp.int32(0), 1, cm, cm_t, sig))
    for b0 in range(0, nrb, CHUNK):  # compile both chunk shapes
        nb = min(CHUNK, nrb - b0)
        if nb != CHUNK:
            int(schedule_from(jnp.uint32(0), jnp.int32(b0), nb, cm, cm_t, sig))
            break
    run_full(jnp.uint32(0))
    pairs = nrb * KROWS * n_pad  # every block scans all padded columns
    best, trials = float("inf"), []
    for t in range(3):
        t0 = time.perf_counter()
        int(schedule_from(jnp.uint32(1 + t), jnp.int32(0), 1, cm, cm_t, sig))
        t1 = time.perf_counter()
        run_full(jnp.uint32(64 + t))
        t2 = time.perf_counter()
        trials.append(round(t2 - t1, 3))
        print(
            f"  knn trial {t}: full {t2-t1:.2f} s, 1-block {t1-t0:.2f} s",
            flush=True,
        )
        best = min(best, t2 - t1)
    rate = pairs / best
    exact_pairs = N_REAL * N_REAL
    implied = exact_pairs / rate
    print(
        f"precluster masked kNN FULL SCHEDULE n={N_REAL} (S={S}, s64={S64}, "
        f"knn={KNN}): {best:.2f} s best-of-3 for {pairs/1e12:.3f} T scanned "
        f"pairs -> {rate/1e9:.2f} G pair/s; implied exact-661k scan "
        f"({exact_pairs/1e12:.3f} T pairs): {implied/60:.2f} min",
        flush=True,
    )
    results["knn"] = {
        "trials_full_s": trials,
        "best_full_s": round(best, 3),
        "scanned_pairs": pairs,
        "rate_gpairs_s": round(rate / 1e9, 3),
        "implied_exact_s": round(implied, 1),
    }


def main():
    which = set(sys.argv[1:] or ["count", "knn"])
    results = {}
    if "count" in which:
        run_count(results)
    if "knn" in which:
        run_knn(results)
    art = pathlib.Path(__file__).resolve().parent / "artifacts"
    art.mkdir(exist_ok=True)
    prev = art / "inverted_full_r5.json"
    if prev.exists():  # merge partial runs into one artifact
        with open(prev) as f:
            results = {**json.load(f).get("results", {}), **results}
    payload = {
        "probe": "bench/probe_inverted_full.py",
        "shape": f"n={N_REAL}, S={S}, count tile {CTILE}, knn "
        f"{KROWS}x{KCOLS} tiles (production geometry)",
        "protocol": "best-of-3, salted per trial, checksum sink, wall "
        "from dispatch to scalar fetch; the 1-block time is recorded "
        "for context only (rates use the raw full-schedule wall)",
        "reference": "lib.rs:702-703 (~90 min, 50 GB, 32 threads for the "
        "661k --count enumeration)",
        "results": results,
    }
    with open(art / "inverted_full_r5.json", "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(f"artifact -> {art / 'inverted_full_r5.json'}")


if __name__ == "__main__":
    main()
