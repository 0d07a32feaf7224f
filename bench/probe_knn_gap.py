"""Where does the single-k kNN scan sit vs the raw samebits kernel?

Measures, at the production shape (tr=2048 row block, tc=8192 column
tiles, knn=50, s64=16), with RTT-cancelled salt-chained loops:

  raw : lax.scan over tiles, Pallas samebits only (selection stripped)
  full: the production `_knn_scan_block_packed` (pallas=True)

MEASUREMENT RULE for this rig: `block_until_ready` does NOT actually
block through the tunneled runtime — every timing must force a scalar
host fetch, and per-dispatch tunnel RTT is cancelled by timing an
N-iteration `fori_loop` chain minus a 1-iteration chain. 2026-08 v5e
readings: raw 3.06 G pair/s, full 3.19 G pair/s — the selection chain
(group shrink + packed top-k merge; ~1.4 ms/tile in isolation) is fully
hidden behind the samebits kernel, so the scan is at its roofline.

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
    b_cm_t = chunk_group_major(b, S64).T.copy()

    @functools.partial(jax.jit, static_argnames=("inner", "mode"))
    def chain(salt, inner, mode):
        def body(_, s):
            aa = a_cm ^ s
            if mode == "full":
                v, i = _knn_scan_block_packed(
                    aa, b_cm_t, jnp.int32(0), jnp.int32(NB),
                    S64, KNN, TC, True, True,
                )
                r = v.sum() + i.sum()
            else:  # samebits-only scan, selection stripped
                def tb(c, t):
                    bt = jax.lax.dynamic_slice(
                        b_cm_t, (0, t * TC), (W2, TC)
                    )
                    sb = samebits_pallas_chunked(aa, bt, S64)
                    return c ^ sb.sum().astype(jnp.int32), None

                r, _ = jax.lax.scan(
                    tb, jnp.int32(0), jnp.arange(NB // TC, dtype=jnp.int32)
                )
            return (r.astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0

        return jax.lax.fori_loop(0, inner, body, salt)

    pairs = TR * NB
    for mode in ("raw", "full"):
        int(chain(jnp.uint32(1), 1, mode))  # compile + drain
        int(chain(jnp.uint32(1), 5, mode))
        t0 = time.perf_counter()
        int(chain(jnp.uint32(2), 1, mode))
        t1 = time.perf_counter()
        int(chain(jnp.uint32(3), 5, mode))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / 4
        print(
            f"{mode:5s}: {dt*1e3:8.2f} ms/block ({NB//TC} tiles) -> "
            f"{pairs/dt/1e9:5.2f} G pair/s, {dt*1e3/(NB//TC):6.2f} ms/tile"
        )


if __name__ == "__main__":
    main()
