"""Sweep the samebits tile geometry: kernel x shape x internal blocks.

VERDICT r2 #6: the XLA fusion tile measures 4.9 G pair/s at 4096x4096 but
the packed kNN scan's Pallas tile runs ~3.05 at (tr=2048, tc=8192) — if the
scan can adopt a faster geometry, every kNN/precluster figure improves.
This probe measures, standalone (salt-chained, RTT-cancelled, chip idle):

  - XLA `_samebits_tile` over (na, nb) shapes
  - Pallas `samebits_pallas_chunked` over (na, nb) x (ti, tj) blocks

and then the packed scan end-to-end at candidate (tr, tc, ti, tj).

Usage: python bench/probe_tile_sweep.py [standalone|scan|all]
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
from sketchtpu.dist.pallas_kernels import (  # noqa: E402
    chunk_group_major,
    samebits_pallas_chunked,
)

S64 = 16
W2 = S64 * 14 * 2


def _time_chain(fn, inner=9):
    """RTT-cancelled seconds per iteration of fn(salt, n) (jit, fetch-forced),
    best of 2."""
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


def standalone():
    shapes = [(4096, 4096), (2048, 8192), (8192, 2048), (2048, 4096),
              (4096, 8192), (8192, 8192), (2048, 2048)]
    print("== XLA _samebits_tile standalone ==")
    for na, nb in shapes:
        a = jax.random.bits(jax.random.PRNGKey(0), (na, W2), dtype=jnp.uint32)
        b = jax.random.bits(jax.random.PRNGKey(1), (nb, W2), dtype=jnp.uint32)

        @functools.partial(jax.jit, static_argnames=("inner",))
        def chain(salt, inner, a=a, b=b):
            def body(_, s):
                r = _samebits_tile(a ^ s, b, S64)
                return r.sum().astype(jnp.uint32) ^ jnp.uint32(1)

            return jax.lax.fori_loop(0, inner, body, salt)

        dt = _time_chain(chain)
        print(f"  xla {na}x{nb}: {dt*1e3:7.2f} ms -> "
              f"{na*nb/dt/1e9:5.2f} G pair/s")

    print("== Pallas samebits_pallas_chunked standalone ==")
    blocks = [(256, 1024), (512, 1024), (256, 2048), (512, 2048),
              (128, 1024), (1024, 1024), (256, 512), (512, 512),
              (2048, 1024), (256, 4096), (512, 4096)]
    for na, nb in [(4096, 4096), (2048, 8192)]:
        a = jax.random.bits(jax.random.PRNGKey(0), (na, W2), dtype=jnp.uint32)
        b = jax.random.bits(jax.random.PRNGKey(1), (nb, W2), dtype=jnp.uint32)
        a_cm = chunk_group_major(a, S64)
        bt_cm = chunk_group_major(b, S64).T.copy()
        for ti, tj in blocks:
            if na % ti or nb % tj:
                continue

            @functools.partial(jax.jit, static_argnames=("inner",))
            def chain(salt, inner, a_cm=a_cm, bt_cm=bt_cm, ti=ti, tj=tj):
                def body(_, s):
                    r = samebits_pallas_chunked(
                        a_cm ^ s, bt_cm, S64, ti=ti, tj=tj
                    )
                    return r.sum().astype(jnp.uint32) ^ jnp.uint32(1)

                return jax.lax.fori_loop(0, inner, body, salt)

            try:
                dt = _time_chain(chain)
            except Exception as exc:
                print(f"  pallas {na}x{nb} ti={ti} tj={tj}: FAIL "
                      f"{str(exc).splitlines()[0][:80]}")
                continue
            print(f"  pallas {na}x{nb} ti={ti:4d} tj={tj:4d}: "
                  f"{dt*1e3:7.2f} ms -> {na*nb/dt/1e9:5.2f} G pair/s")


def scan():
    from sketchtpu.dist.knn_jax import _knn_scan_block_packed

    NB, KNN = 65536, 50
    print("== packed scan end-to-end (pallas tile) ==")
    cases = [
        # (tr, tc, ti, tj)
        (2048, 8192, 256, 1024),   # current production default
        (2048, 8192, 512, 2048),
        (2048, 4096, 256, 1024),
        (2048, 4096, 512, 2048),
        (4096, 4096, 256, 1024),
        (4096, 4096, 512, 2048),
        (4096, 8192, 512, 2048),
        (2048, 16384, 256, 1024),
        (2048, 8192, 512, 1024),
        (2048, 8192, 256, 2048),
    ]
    b = jax.random.bits(jax.random.PRNGKey(1), (NB, W2), dtype=jnp.uint32)
    bt_cm_all = chunk_group_major(b, S64).T.copy()
    for tr, tc, ti, tj in cases:
        a = jax.random.bits(jax.random.PRNGKey(0), (tr, W2), dtype=jnp.uint32)
        a_cm = chunk_group_major(a, S64)

        @functools.partial(jax.jit, static_argnames=("inner",))
        def chain(salt, inner, a_cm=a_cm, tr=tr, tc=tc, ti=ti, tj=tj):
            def body(_, s):
                v, i = _knn_scan_block_packed(
                    a_cm ^ s, bt_cm_all, jnp.int32(0), jnp.int32(NB),
                    S64, KNN, tc, True, True, ti=ti, tj=tj,
                )
                return (
                    (v.sum() + i.sum()).astype(jnp.uint32) ^ jnp.uint32(1)
                ) + s * 0

            return jax.lax.fori_loop(0, inner, body, salt)

        try:
            dt = _time_chain(chain, inner=5)
        except Exception as exc:
            print(f"  scan tr={tr} tc={tc} ti={ti} tj={tj}: FAIL "
                  f"{str(exc).splitlines()[0][:80]}")
            continue
        pairs = tr * NB
        print(f"  scan tr={tr:4d} tc={tc:5d} ti={ti:3d} tj={tj:4d}: "
              f"{dt*1e3:7.2f} ms/block -> {pairs/dt/1e9:5.2f} G pair/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("standalone", "all"):
        standalone()
    if which in ("scan", "all"):
        scan()
