"""Device (JAX/XLA/TPU) samebits engine: the hot kernel of all distance
modes.

samebits(i, j) counts sketch bins whose low-BBITS sign bits agree — an
XNOR + AND-reduction over 14 bit-planes followed by popcount
(/root/reference/src/distances/jaccard.rs:15-25). On TPU this runs on the
VPU over uint32 lanes: u64 plane words are reinterpreted as pairs of u32
(bit order is irrelevant to popcount), the per-plane AND chain uses the
precomputed complement of the reference operand (~a ^ b == ~(a ^ b)), and
`jax.lax.population_count` reduces each surviving mask word.

The engine tiles query columns so the (rows x cols x words) intermediate
stays in a fusion-friendly size, and is used by dist/api.py via the
`engine` hook — the scalar f64 distance pipeline on top is unchanged, so
results are identical to the host oracle.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import BBITS

_U32 = jnp.uint32


@functools.partial(jax.jit, static_argnames=("s64",))
def _samebits_tile(a: jnp.ndarray, b: jnp.ndarray, s64: int) -> jnp.ndarray:
    """a: (na, W2) u32, b: (nb, W2) u32 with W2 = BBITS * s64 * 2, laid out
    [chunk][plane][lo,hi]. Returns (na, nb) int32 samebits."""
    na = a.shape[0]
    nb = b.shape[0]
    ar = a.reshape(na, 1, s64, BBITS, 2)
    br = b.reshape(1, nb, s64, BBITS, 2)
    nar = ~ar
    acc = jnp.full((na, nb, s64, 2), 0xFFFFFFFF, dtype=_U32)
    for p in range(BBITS):
        acc = acc & (nar[:, :, :, p] ^ br[:, :, :, p])
    counts = jax.lax.population_count(acc)
    return jnp.sum(counts, axis=(2, 3), dtype=jnp.int32)


class DeviceSamebitsEngine:
    """Drop-in `engine` for dist/api.py drivers."""

    def __init__(self, sketchsize64: int, col_tile: int = 2048):
        from ..runtime import enable_compilation_cache

        enable_compilation_cache()
        self.s64 = sketchsize64
        self.col_tile = col_tile

    def _to_u32(self, mat: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(mat, dtype=np.uint64).view(np.uint32)

    def matrix(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """All-pairs samebits: a (na, W) u64, b (nb, W) u64 -> (na, nb)."""
        a32 = self._to_u32(a)
        b32 = self._to_u32(b)
        nb = b32.shape[0]
        pending = []
        for j0 in range(0, nb, self.col_tile):
            tile = b32[j0 : j0 + self.col_tile]
            pad = 0
            if tile.shape[0] < min(self.col_tile, nb) and nb > self.col_tile:
                pad = self.col_tile - tile.shape[0]
                tile = np.pad(tile, ((0, pad), (0, 0)))
            # async dispatch; collection below overlaps device compute
            pending.append((pad, _samebits_tile(a32, tile, self.s64)))
        outs = []
        for pad, res in pending:
            res = np.asarray(res)
            if pad:
                res = res[:, : res.shape[1] - pad]
            outs.append(res)
        return np.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


@functools.partial(jax.jit, static_argnames=("s64", "ani", "k"))
def jaccard_dist_block(
    a: jnp.ndarray, b: jnp.ndarray, s64: int, k: float = 0.0, ani: bool = False
) -> jnp.ndarray:
    """Fully on-device Jaccard (or ANI) distance tile in f32.

    This is the high-throughput path for large all-vs-all runs where the f64
    host post-processing would dominate; bit-exact output formatting uses
    the samebits path instead.
    """
    sb = _samebits_tile(a, b, s64).astype(jnp.float32)
    maxnbits = float(s64 * 64)
    expected = float(int(s64 * 64) >> BBITS)
    diff = jnp.maximum(sb - expected, 0.0)
    j = (diff * maxnbits / (maxnbits - expected)) / maxnbits
    if ani:
        val = 1.0 + 1.0 / k * jnp.log((2.0 * j) / (1.0 + j))
        return jnp.maximum(0.0, val)
    return 1.0 - j
