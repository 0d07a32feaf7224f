"""Decompose and attack the kNN scan's selection overhead (VERDICT r2 #1).

Clean r3 probe facts (probe_knn_gap, chip idle, RTT-cancelled):
  pallas raw 3.06 / pallas full 2.41 / xla raw 4.71 / xla full 1.69 G pair/s
The XLA samebits fusion is 54% faster than the Pallas kernel at the exact
production shape, but fusing the selection consumers into it collapses to
1.69. Hypothesis: an `optimization_barrier` between the XLA samebits tile
and the selection chain gets XLA-rate samebits + Pallas-style isolation,
and a cheaper selection (two-level group shrink) recovers the rest.

Modes (all exact selection semantics):
  xbar    : XLA samebits -> barrier -> current shrink(g=8) + packed merge
  xbar2   : XLA samebits -> barrier -> two-level shrink (32 then 8)
  selparts: stage-by-stage timing of the selection chain on a materialized
            random int32 tile (group-max, top_k(gm), gather, merge)
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketchtpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from sketchtpu.dist.jaccard_jax import _samebits_tile  # noqa: E402
from sketchtpu.dist.knn_jax import (  # noqa: E402
    _NEG,
    _pack_shift,
    _tile_topk_reduce,
)

S64, TR, NB, TC, KNN = 16, 2048, 65536, 8192, 50
W2 = S64 * 14 * 2


def _time_chain(fn, inner=5):
    float(fn(jnp.uint32(0), 1))
    float(fn(jnp.uint32(0), inner))
    best = float("inf")
    for t in range(2):
        t0 = time.perf_counter()
        float(fn(jnp.uint32(1 + t), 1))
        t1 = time.perf_counter()
        float(fn(jnp.uint32(64 + t), inner))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (inner - 1))
    return best


def _two_level_reduce(key, knn):
    """Exact two-level shrink: 32-wide groups then 8-wide on the gathered
    superset. Same superset/tie guarantees as _tile_topk_reduce composed."""
    k1, loc1 = _tile_topk_reduce(key, knn, g=32)
    if loc1 is None:
        return key, None
    k2, loc2 = _tile_topk_reduce(k1, knn, g=8)
    if loc2 is None:
        return k1, loc1
    return k2, jnp.take_along_axis(loc1, loc2, axis=1)


def scan_mode(mode: str):
    a = jax.random.bits(jax.random.PRNGKey(0), (TR, W2), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (NB, W2), dtype=jnp.uint32)
    shift = _pack_shift(S64)
    colmask = (1 << shift) - 1

    @functools.partial(jax.jit, static_argnames=("inner",))
    def chain(salt, inner):
        def body(_, s):
            init = jnp.full((TR, KNN), -1, jnp.int32)

            def tile_body(carry, t):
                c0 = t * TC
                bt = jax.lax.dynamic_slice(b, (c0, 0), (TC, W2))
                sb = _samebits_tile(a ^ s, bt, S64)
                sb = jax.lax.optimization_barrier(sb)
                if mode == "xbar2":
                    sb_s, loc = _two_level_reduce(sb, KNN)
                else:
                    sb_s, loc = _tile_topk_reduce(sb, KNN)
                if loc is None:
                    loc = jax.lax.broadcasted_iota(jnp.int32, sb_s.shape, 1)
                packed = (sb_s << shift) | (colmask - (c0 + loc))
                packed = jnp.where(sb_s < 0, -1, packed)
                cat = jnp.concatenate([carry, packed], axis=1)
                merged, _ = jax.lax.top_k(cat, KNN)
                return merged, None

            carry, _ = jax.lax.scan(
                tile_body, init, jnp.arange(NB // TC, dtype=jnp.int32)
            )
            return (carry.sum().astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0

        return jax.lax.fori_loop(0, inner, body, salt)

    dt = _time_chain(chain)
    pairs = TR * NB
    print(f"{mode:8s}: {dt*1e3:8.2f} ms/block -> {pairs/dt/1e9:5.2f} G pair/s,"
          f" {dt*1e3/(NB//TC):6.2f} ms/tile")


def selparts():
    """Stage costs of the selection chain on a (TR, TC) int32 tile."""
    key0 = jax.random.randint(
        jax.random.PRNGKey(3), (TR, TC), 0, S64 * 64, dtype=jnp.int32
    )

    def timed(name, f):
        @functools.partial(jax.jit, static_argnames=("inner",))
        def chain(salt, inner):
            def body(_, s):
                r = f(key0 ^ (s & jnp.uint32(1)).astype(jnp.int32))
                return (r.sum().astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0

            return jax.lax.fori_loop(0, inner, body, salt)

        dt = _time_chain(chain, inner=9)
        print(f"  {name:24s}: {dt*1e3:7.3f} ms")

    g = 8
    ng = TC // g

    timed("group-max (g=8)", lambda k: k.reshape(TR, ng, g).max(axis=2))
    timed(
        "gm + top_k(1024->50)",
        lambda k: jax.lax.top_k(k.reshape(TR, ng, g).max(axis=2), KNN)[0],
    )
    timed(
        "gm + top_k + sort+gather",
        lambda k: jnp.take_along_axis(
            k.reshape(TR, ng, g),
            jnp.sort(
                jax.lax.top_k(k.reshape(TR, ng, g).max(axis=2), KNN)[1],
                axis=1,
            )[:, :, None],
            axis=1,
        ).reshape(TR, KNN * g),
    )
    timed("full _tile_topk_reduce", lambda k: _tile_topk_reduce(k, KNN)[0])
    timed(
        "two-level reduce (32,8)", lambda k: _two_level_reduce(k, KNN)[0]
    )
    cat0 = jax.random.randint(
        jax.random.PRNGKey(4), (TR, KNN * g + KNN), 0, 1 << 30,
        dtype=jnp.int32,
    )
    timed(
        "merge top_k(450->50)",
        lambda k: jax.lax.top_k(
            cat0 + k[:, :1] * 0, KNN
        )[0],
    )
    timed(
        "direct top_k(8192->50)",
        lambda k: jax.lax.top_k(k, KNN)[0],
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("selparts", "all"):
        print("== selection stage costs (tile 2048x8192) ==")
        selparts()
    for m in ("xbar", "xbar2"):
        if which in (m, "all"):
            scan_mode(m)
