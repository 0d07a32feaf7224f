"""Where does the single-k kNN scan lose throughput vs the raw samebits
tile? Measures, at the production shape (tr=2048 rows/block, tc=8192
column tiles, knn=50):

  A. raw samebits scan (no select)        — upper bound
  B. + _tile_valid mask + where           — mask cost
  C. + _tile_topk_reduce (group shrink)   — shrink cost
  D. full _knn_scan_block                 — running top-k merge cost

Run on the real chip: python bench/probe_knn_gap.py
"""

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from sketchtpu.runtime import enable_compilation_cache

enable_compilation_cache()

from sketchtpu.dist.jaccard_jax import _samebits_tile
from sketchtpu.dist.knn_jax import _knn_scan_block, _tile_topk_reduce, _tile_valid, _NEG

S64 = 16
W2 = S64 * 14 * 2
TR = 2048
NB = 65536
TC = 8192
KNN = 50

key = jax.random.PRNGKey(0)
a = jax.random.bits(key, (TR, W2), dtype=jnp.uint32)
b = jax.random.bits(jax.random.PRNGKey(1), (NB, W2), dtype=jnp.uint32)
sig = jnp.zeros((TR, 1), jnp.int32)
bsig = jnp.zeros((NB, 1), jnp.int32)


def timeit(fn, *args, reps=3):
    fn(*args).block_until_ready()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(*args).block_until_ready()
        best = min(best, time.time() - t0)
    return best


@functools.partial(jax.jit, static_argnames=("mode",))
def scan_probe(a, b, mode):
    n_tiles = NB // TC

    def body(carry, t):
        c0 = t * TC
        bt = jax.lax.dynamic_slice(b, (c0, 0), (TC, W2))
        sb = _samebits_tile(a, bt, S64)
        if mode >= 1:
            cols, valid = _tile_valid(
                c0, TR, TC, jnp.int32(0), jnp.int32(NB), True, False, sig, bsig
            )
            sb = jnp.where(valid, sb, _NEG)
        if mode >= 2:
            sb, loc = _tile_topk_reduce(sb, KNN)
        return carry ^ sb.sum().astype(jnp.int32), None

    out, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_tiles, dtype=jnp.int32))
    return out


pairs = TR * NB
for mode, label in [(0, "A raw samebits scan"), (1, "B + valid mask"), (2, "C + group shrink")]:
    dt = timeit(lambda a, b, m=mode: scan_probe(a, b, m), a, b)
    print(f"{label:24s}: {dt*1e3:7.2f} ms  {pairs/dt/1e9:5.2f} G pair/s")

dt = timeit(
    lambda a, b: _knn_scan_block(
        a, b, jnp.int32(0), jnp.int32(NB), sig, bsig, S64, KNN, TC, True, False
    )[0],
    a,
    b,
)
print(f"{'D full _knn_scan_block':24s}: {dt*1e3:7.2f} ms  {pairs/dt/1e9:5.2f} G pair/s")
