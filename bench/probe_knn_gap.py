"""Where does the single-k kNN scan sit vs the raw samebits kernel?

Measures, at the production shape (tr=2048 row block, tc=8192 column
tiles, knn=50, s64=16), with RTT-cancelled salt-chained loops:

  raw : lax.scan over tiles, Pallas samebits only (selection stripped)
  full: the production `_knn_scan_block_packed` (pallas=True)

MEASUREMENT RULE for this rig: `block_until_ready` does NOT actually
block through the tunneled runtime — every timing must force a scalar
host fetch, and per-dispatch tunnel RTT is cancelled by timing an
N-iteration `fori_loop` chain minus a 1-iteration chain, WITH THE CHIP
OTHERWISE IDLE (concurrent jobs serialize on the one core and corrupt
both measurements). 2026-08 v5e clean readings: pallas raw 3.05,
pallas full 2.41, masked 2.07 G pair/s — the selection chain costs its
full isolated ~1.45 ms/tile (nothing overlaps on a single tensor core).

ROUND-4 GROUP-MAX EXPERIMENT (code deleted after measurement — see the
round-4 commit that removed _knn_scan_block_gm / knn_keys_pallas for the
exact code; every number below is an RTT-cancelled clean reading at the
512x512 kernel blocks, 2026-08 v5e):

  raw samebits kernel            4.71 ms/tile  3.56 G pair/s
  keys kernel gw=1 (kraw)        4.85 ms/tile  3.46   (mask+pack fused)
  keys kernel gw=4 +fold (gmraw) 4.60 ms/tile  3.64   (epilogue is FREE;
                                 writes 4x less HBM than raw — confirms
                                 the kernel is VPU-bound, not write-bound)
  gm phase 1 (+top_k merge)      5.48 ms/tile  3.06
  gm phase 2 (member recompute) 29.20 ms/block        (XLA row gather of
                                 2048x400 x 2KB = 1.6 GB; HBM floor of
                                 that gather alone is ~2.3 ms)
  gm total                       9.03 ms/tile  1.86
  production v1                  6.07 ms/tile  2.76

Floor argument: even a perfect phase 2 at its 2.3 ms HBM-gather floor
gives 43.8 + 2.3 = 46.1 ms/block = 2.9 G pair/s — inside this rig's
~10% noise band around v1's 2.76 and far from the 3.2 target, with ~500
lines of extra machinery. v1's own selection cost (6.07 - 4.71 = 1.36
ms/tile) decomposes into measured minimal components: top_k(2048x1024
-> 50) 0.38 ms + group gather ~0.7 ms + mask/pack/merge ~0.3 ms — v1 IS
the component floor for an exact selection, so it stays the only scan.

Reference hot loop being modelled: the per-row heap scan of
/root/reference/src/distances/mod.rs:133-224.
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

from sketchtpu.dist.pallas_kernels import (  # noqa: E402
    chunk_group_major,
    samebits_pallas_chunked,
)
from sketchtpu.dist.knn_jax import _knn_scan_block_packed  # noqa: E402

S64, TR, NB, TC, KNN = 16, 2048, 65536, 8192, 50
W2 = S64 * 14 * 2


def main():
    a = jax.random.bits(jax.random.PRNGKey(0), (TR, W2), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (NB, W2), dtype=jnp.uint32)
    a_cm = chunk_group_major(a, S64)
    b_cm = chunk_group_major(b, S64)
    b_cm_t = b_cm.T.copy()

    # big operands are explicit jit PARAMETERS: closed-over device arrays
    # serialize into the remote-compile request body as constants, and the
    # tunneled compile service rejects the ~380 MB payload (HTTP 413)
    @functools.partial(jax.jit, static_argnames=("inner", "mode"))
    def chain(salt, inner, mode, a=None, b=None, a_cm=None, b_cm=None,
              b_cm_t=None):
        def body(_, s):
            if mode == "full":
                v, i = _knn_scan_block_packed(
                    a_cm ^ s, b_cm_t, jnp.int32(0), jnp.int32(NB),
                    S64, KNN, TC, True, True,
                )
                r = v.sum() + i.sum()
            elif mode == "xfull":  # packed scan, XLA samebits tile
                v, i = _knn_scan_block_packed(
                    a ^ s, b, jnp.int32(0), jnp.int32(NB),
                    S64, KNN, TC, True, False,
                )
                r = v.sum() + i.sum()
            elif mode == "xraw":  # XLA samebits-only scan
                from sketchtpu.dist.jaccard_jax import _samebits_tile

                def tbx(c, t):
                    bt = jax.lax.dynamic_slice(b, (t * TC, 0), (TC, W2))
                    sb = _samebits_tile(a ^ s, bt, S64)
                    return c ^ sb.sum().astype(jnp.int32), None

                r, _ = jax.lax.scan(
                    tbx, jnp.int32(0), jnp.arange(NB // TC, dtype=jnp.int32)
                )
            else:  # pallas samebits-only scan, selection stripped
                def tb(c, t):
                    bt = jax.lax.dynamic_slice(
                        b_cm_t, (0, t * TC), (W2, TC)
                    )
                    sb = samebits_pallas_chunked(a_cm ^ s, bt, S64)
                    return c ^ sb.sum().astype(jnp.int32), None

                r, _ = jax.lax.scan(
                    tb, jnp.int32(0), jnp.arange(NB // TC, dtype=jnp.int32)
                )
            return (r.astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0

        return jax.lax.fori_loop(0, inner, body, salt)

    S = 100  # precluster sign-prefilter width (inverted sketch_size)
    a_sig = jax.random.randint(
        jax.random.PRNGKey(2), (TR, S), 0, 1 << 16, dtype=jnp.int32
    )
    b_sig = jax.random.randint(
        jax.random.PRNGKey(3), (NB, S), 0, 1 << 16, dtype=jnp.int32
    )

    @functools.partial(jax.jit, static_argnames=("inner",))
    def chain_masked(salt, inner, a_cm=None, b_cm_t=None, a_sig=None,
                     b_sig=None):
        def body(_, s):
            v, i = _knn_scan_block_packed(
                a_cm ^ s, b_cm_t, jnp.int32(0), jnp.int32(NB),
                S64, KNN, TC, True, True,
                a_sig=a_sig, b_sig=b_sig, masked=True,
            )
            return (
                (v.sum() + i.sum()).astype(jnp.uint32) ^ jnp.uint32(1)
            ) + s * 0

        return jax.lax.fori_loop(0, inner, body, salt)

    pairs = TR * NB
    modes = sys.argv[1:] or ["raw", "full", "xraw", "xfull", "masked"]
    for mode in modes:
        if mode.startswith("masked"):
            ch = lambda s, n: chain_masked(  # noqa: E731
                s, n, a_cm=a_cm, b_cm_t=b_cm_t, a_sig=a_sig, b_sig=b_sig
            )
        else:
            ch = lambda s, n: chain(  # noqa: E731
                s, n, mode, a=a, b=b, a_cm=a_cm, b_cm=b_cm, b_cm_t=b_cm_t
            )
        int(ch(jnp.uint32(1), 1))  # compile + drain
        int(ch(jnp.uint32(1), 5))
        t0 = time.perf_counter()
        int(ch(jnp.uint32(2), 1))
        t1 = time.perf_counter()
        int(ch(jnp.uint32(3), 5))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / 4
        note = f" (S={S} sign prefilter)" if mode.startswith("masked") else ""
        print(
            f"{mode:7s}: {dt*1e3:8.2f} ms/block ({NB//TC} tiles) -> "
            f"{pairs/dt/1e9:5.2f} G pair/s, {dt*1e3/(NB//TC):6.2f} ms/tile"
            f"{note}"
        )


if __name__ == "__main__":
    main()
