"""Device (TPU) inverted-index query kernels.

The in-memory inverted index is a dense [n_samples x sketch_size] u16 sign
matrix (inverted/index.py). All three query families reduce to sign-equality
tiles on the VPU:

- match-count  (inverted.rs:229-240): per (query, sample) count of equal bins
- any/all-bins (inverted.rs:243-268): per (query, sample) OR/AND of equality
- precluster --count (inverted.rs:271-300): number of sample pairs sharing at
  least one bin — the reference's only published performance number is this
  operation ("~90m and 50Gb for 661k samples, 32 threads", lib.rs:702-703);
  here it is an all-vs-all equality-any tile reduction, tiled over the upper
  triangle and streamed so only per-tile int32 counts leave the device.

Signs are widened to i32 lanes (one bin per lane); the equality mask never
materialises in HBM — XLA fuses the compare into the `any`/`sum` reduction.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("diag",))
def _match_count_tile(
    a: jnp.ndarray,
    b: jnp.ndarray,
    na: jnp.ndarray,
    nb: jnp.ndarray,
    diag: bool,
) -> jnp.ndarray:
    """a: (ti, S) i32, b: (tj, S) i32 -> () int32: number of (i, j) pairs
    with at least one equal bin. Rows past the traced real sizes (na, nb)
    are padding and masked out; diag=True additionally restricts to j > i
    (upper triangle of a self tile)."""
    eq = (a[:, None, :] == b[None, :, :]).any(axis=2)
    ti, tj = eq.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    eq = eq & (ri < na) & (ci < nb)
    if diag:
        eq = eq & (ci > ri)
    return jnp.sum(eq, dtype=jnp.int32)


@jax.jit
def _match_any_tile(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(ti, S) x (tj, S) -> (ti, tj) bool: any shared bin."""
    return (a[:, None, :] == b[None, :, :]).any(axis=2)


@jax.jit
def _match_count_matrix(q: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(nq, S) x (n, S) -> (nq, n) int32: count of shared bins per pair."""
    return jnp.sum(
        (q[:, None, :] == m[None, :, :]).astype(jnp.int32), axis=2
    )


class DeviceInvertedEngine:
    """TPU-resident inverted-index queries over the dense sign matrix."""

    def __init__(self, sign_matrix: np.ndarray, tile: int = 4096):
        from ..runtime import enable_compilation_cache

        enable_compilation_cache()
        self.n = int(sign_matrix.shape[0])
        self.tile = min(tile, max(256, self.n))
        # u16 signs -> i32 lanes (pad rows are masked by size, not value)
        self._mat = jax.device_put(sign_matrix.astype(np.int32))

    def _tile_of(self, i0: int) -> tuple[jnp.ndarray, int]:
        t = self._mat[i0 : i0 + self.tile]
        real = int(t.shape[0])
        pad = self.tile - real
        if pad:
            t = jnp.pad(t, ((0, pad), (0, 0)))
        return t, real

    def any_shared_bin_count(self) -> int:
        """Total sample pairs (i < j) sharing >= 1 bin. Streams int32 tile
        counts off device; the (tile x tile x S) equality mask stays fused
        on the VPU."""
        total = 0
        n, tile = self.n, self.tile
        for i0 in range(0, n, tile):
            a, na = self._tile_of(i0)
            for j0 in range(i0, n, tile):
                b, nb = (a, na) if j0 == i0 else self._tile_of(j0)
                total += int(
                    _match_count_tile(
                        a, b, np.int32(na), np.int32(nb), diag=j0 == i0
                    )
                )
        return total

    def match_counts(self, queries: np.ndarray) -> np.ndarray:
        """(nq, S) u16 query signs -> (nq, n) int64 shared-bin counts."""
        q = jax.device_put(np.asarray(queries, dtype=np.int32))
        outs = []
        for j0 in range(0, self.n, self.tile):
            outs.append(
                np.asarray(_match_count_matrix(q, self._mat[j0 : j0 + self.tile]))
            )
        return np.concatenate(outs, axis=1).astype(np.int64)

    def any_shared_rows(self, queries: np.ndarray) -> np.ndarray:
        """(nq, S) u16 query signs -> (nq, n) bool any-shared-bin mask."""
        q = jax.device_put(np.asarray(queries, dtype=np.int32))
        outs = []
        for j0 in range(0, self.n, self.tile):
            outs.append(
                np.asarray(_match_any_tile(q, self._mat[j0 : j0 + self.tile]))
            )
        return np.concatenate(outs, axis=1)
