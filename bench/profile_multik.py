"""Profile the fast multi-k sketching kernel across genome sizes.

The known soft spot (ARCHITECTURE.md): per-genome candidate count is
~c * num_bins * nk independent of genome length, so the single candidate
sort dominates when genomes are short. This script measures

1. end-to-end multi-k sketching throughput per genome size, and
2. a standalone 3-key sort of the same candidate-slot volume the kernel
   sorts, to apportion kernel time between hashing and sorting.

Run on the real chip: `python bench/profile_multik.py`.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from sketchtpu.runtime import enable_compilation_cache

enable_compilation_cache()

from sketchtpu.hash.nthash_multik import group_thresholds, pick_block_geometry
from sketchtpu.ingest.fastx import DnaStream
from sketchtpu.sketchcore.sketch_jax import DeviceSketchBackend

KSET = [17, 21, 25, 29, 31, 33, 37]
NBINS = 1024


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


@functools.partial(jax.jit, static_argnames=("n",))
def sort3_probe(salt, n):
    k0 = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 14, dtype=jnp.int32)
    hi = jax.random.bits(jax.random.PRNGKey(1), (n,), dtype=jnp.uint32) ^ salt
    lo = jax.random.bits(jax.random.PRNGKey(2), (n,), dtype=jnp.uint32)
    a, b, c = jax.lax.sort((k0, hi, lo), num_keys=3)
    return a[0] + b[0].astype(jnp.int32) + c[0].astype(jnp.int32)


def time_sort(n, reps=3):
    int(sort3_probe(jnp.uint32(0), n))  # compile
    t0 = time.time()
    s = jnp.uint32(1)
    for _ in range(reps):
        s = jnp.uint32(int(sort3_probe(s, n)) & 0xFFFF)
    return (time.time() - t0) / reps


def main():
    for glen, count in [(2_000_000, 14), (1_000_000, 16), (500_000, 32), (250_000, 64)]:
        be = DeviceSketchBackend()
        be.bin_minima_multi_k(batch(1, glen, count), KSET, True, NBINS)  # warm
        streams = batch(2, glen, count)
        t0 = time.time()
        be.bin_minima_multi_k(streams, KSET, True, NBINS)
        dt = time.time() - t0
        rate = glen * count * len(KSET) / dt / 1e6

        # candidate-slot volume the kernel's one sort sees
        t_lo, t_hi, eligible, dens = group_thresholds([glen] * count, NBINS)
        blk, w = pick_block_geometry(dens)
        n0 = 1 << 24
        n_slots = (n0 // blk) * w * len(KSET)
        ts = time_sort(int(n_slots)) if eligible else float("nan")
        print(
            f"glen={glen:>9,} x{count:>3}: {dt:6.2f}s  {rate:6.0f} Mbase-k/s   "
            f"density={dens:.4f} w={w} slots={n_slots / 1e6:.1f}M  "
            f"sort-alone={ts:.2f}s"
        )


if __name__ == "__main__":
    main()
