"""One-shot on-chip validation after the 2026-08-17 changes.

Run on the real TPU (no env overrides): `python bench/validate_chip.py`.
Covers, in order:

1. samebits tile rate (bench.py headline, sanity vs ~3.4 G pair/s).
2. Multi-k sketching throughput across genome sizes — validates the
   select-chain `optimization_barrier` fix (expect the 7-k kernel to beat
   the pre-fix 214/141 Mbase-k/s figures; BENCHMARKS.md update follows).
3. The compiled Pallas core/accessory completeness variant vs the
   corrected XLA tile (interpret-verified; this is the first compiled
   run). If it matches and is fast, flip the corrected-run default in
   DeviceCoreAccEngine/_knn_coreacc.
4. Corrected single-k selection kernel compile + A/B vs host on random
   data.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from sketchtpu.runtime import enable_compilation_cache

enable_compilation_cache()


def step1_samebits():
    from sketchtpu.dist.jaccard_jax import _samebits_tile
    import functools

    s64 = 16
    w2 = s64 * 14 * 2
    a = jax.random.bits(jax.random.PRNGKey(0), (4096, w2), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (4096, w2), dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("s64", "inner"))
    def probe(a, b, salt, s64, inner):
        def body(_, s):
            r = _samebits_tile(a ^ s, b, s64)
            return r.sum().astype(jnp.uint32) ^ jnp.uint32(1)

        return jax.lax.fori_loop(0, inner, body, salt)

    float(probe(a, b, jnp.uint32(0), s64, 5))
    t0 = time.time()
    s = jnp.uint32(1)
    for _ in range(4):
        s = probe(a, b, s, s64, 5)
    float(s)
    dt = (time.time() - t0) / 20
    print(f"1) samebits: {4096 * 4096 / dt / 1e9:.2f} G pair/s")


def step2_multik():
    from sketchtpu.ingest.fastx import DnaStream
    from sketchtpu.sketchcore.sketch_jax import DeviceSketchBackend

    kset = [17, 21, 25, 29, 31, 33, 37]

    def batch(seed, glen, count):
        r = np.random.default_rng(seed)
        return [
            DnaStream(
                codes=r.integers(0, 4, glen).astype(np.uint8),
                breaks=np.zeros(0, dtype=np.int64),
                acgt=np.array([1, 1, 1, 1], dtype=np.int64),
            )
            for _ in range(count)
        ]

    be = DeviceSketchBackend()
    for glen, count in [(2_000_000, 14), (250_000, 64)]:
        be.bin_minima_multi_k(batch(1, glen, count), kset, True, 1024)
        streams = batch(2, glen, count)
        t0 = time.time()
        be.bin_minima_multi_k(streams, kset, True, 1024)
        dt = time.time() - t0
        print(
            f"2) multik {glen:>9,} x{count:>3}: {dt:6.2f}s "
            f"{glen * count * len(kset) / dt / 1e6:6.0f} Mbase-k/s "
            f"(pre-barrier-fix: 214 @2Mb / 141 @250kb)"
        )


def step3_pallas_comp():
    from sketchtpu.dist.coreacc_jax import coreacc_tile
    from sketchtpu.dist.coreacc_pallas import chunk_major, coreacc_pallas

    rng = np.random.default_rng(7)
    s64 = 16
    w2 = s64 * 14 * 2
    kmers = (17, 21, 25, 29, 31, 33, 37)
    nk = len(kmers)
    na, nb = 1024, 2048
    base = rng.integers(0, 2**32, (1, w2), dtype=np.uint32)
    keep = np.linspace(0.95, 0.6, nk)[:, None, None]
    a = np.where(
        rng.random((nk, na, w2)) < keep,
        base,
        rng.integers(0, 2**32, (nk, na, w2), dtype=np.uint32),
    ).astype(np.uint32)
    b = np.where(
        rng.random((nk, nb, w2)) < keep,
        base,
        rng.integers(0, 2**32, (nk, nb, w2), dtype=np.uint32),
    ).astype(np.uint32)
    c1 = jnp.asarray(rng.uniform(0.7, 1.0, na).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(0.7, 1.0, nb).astype(np.float32))

    want = np.asarray(
        coreacc_tile(
            jnp.asarray(a), jnp.asarray(b), s64, kmers, 1024,
            c1=c1, c2=c2, cutoff=0.64,
        )
    )
    a_cm = chunk_major(jnp.asarray(a), s64)
    bt = jnp.transpose(chunk_major(jnp.asarray(b), s64))
    got_d = coreacc_pallas(
        a_cm, bt, s64, kmers, 1024, ti=128, tj=512, c1=c1, c2=c2,
        cutoff=0.64,
    )
    got = np.asarray(got_d)
    bad = np.abs(got - want).max()
    print(f"3) pallas comp vs xla comp: max abs diff {bad:.2e} "
          f"({'OK' if bad < 1e-5 else 'INVESTIGATE'})")
    # quick rate probe (salted reruns). NOTE: this forces the full (na, nb,
    # 2) f32 output across the tunneled device->host link each iteration,
    # so on this rig it measures the tunnel, not the kernel (~3 M pair/s).
    # bench/probe_comp_pallas.py chains salted iterations on device and
    # measured 307 corrected vs 282 uncorrected M pair/s — parity.
    t0 = time.time()
    for i in range(3):
        np.asarray(
            coreacc_pallas(
                a_cm, bt, s64, kmers, 1024, ti=128, tj=512,
                c1=c1 + jnp.float32(i * 1e-6), c2=c2, cutoff=0.64,
            )
        )
    dt = (time.time() - t0) / 3
    print(f"   corrected pallas rate: {na * nb / dt / 1e6:.0f} M pair/s "
          f"(uncorrected pallas baseline ~404 M pair/s)")


def step4_comp_select():
    from sketchtpu.dist import api
    from sketchtpu.dist.knn_jax import DeviceKnnEngine
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_knn_device import _fake_ms

    ms = _fake_ms(n=512, nk=2, s64=16, kmers=(17, 21), seed=3)
    rng = np.random.default_rng(4)
    comp = rng.uniform(0.7, 1.0, 512)
    dist_type = api.set_k(ms, 17, False)
    host = api.self_dists_knn(ms, 8, dist_type, completeness_vec=comp)
    dev = DeviceKnnEngine(ms).self_knn(
        8, dist_type, completeness_vec=comp
    )
    worst = 0.0
    for dr, hr in zip(dev, host):
        d = sorted(np.float32(x) for _, x in dr)
        h = sorted(np.float32(x) for _, x in hr)
        worst = max(worst, float(np.abs(np.array(d) - np.array(h)).max()))
    print(f"4) corrected single-k selection vs host: worst row diff "
          f"{worst:.2e} ({'OK' if worst < 1e-6 else 'INVESTIGATE'})")


if __name__ == "__main__":
    for step in (step1_samebits, step2_multik, step3_pallas_comp,
                 step4_comp_select):
        try:
            step()
        except Exception as exc:  # keep going; report at the end
            print(f"{step.__name__} FAILED: {exc!r}")
