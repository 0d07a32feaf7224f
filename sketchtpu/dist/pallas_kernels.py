"""Pallas TPU kernels for the samebits tile computation.

Formulation: an outer-product tile. Reference samples live on sublanes,
query samples on lanes; for each of the s64*2 u32 mask words the 14-plane
AND-chain runs on (TI, TJ) vregs built from a broadcast column of A and a
broadcast row of B^T, followed by an in-register popcount accumulation.
The whole tile's traffic is one A block + one B^T block + the (TI, TJ)
int32 output — the plane-mask intermediates never touch HBM (unlike the
XLA fusion path).

A is (na, W2) u32; B is passed transposed as (W2, nb) so its per-word rows
broadcast across lanes. W2 = sketchsize64 * BBITS * 2 words laid out
[chunk][plane][lo,hi] exactly as in the .skd format.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BBITS


_CHUNK_GROUP = 4  # 64-bin chunks per grid step: 4*28 = 112 words -> 128 pad


def chunk_group_major(x: jnp.ndarray, s64: int) -> jnp.ndarray:
    """(n, W2) u32 [chunk][plane][lo,hi] -> (n, (s64/G)*128) with each
    grid step's G-chunk word group zero-padded from G*28 to 128 words.

    The grouped layout keeps the per-grid-step unroll small enough for
    Mosaic (the whole-row kernel fails to compile at W2=448) while wasting
    only 12.5% of the block bandwidth, and makes every Pallas block a
    (sublane x 128-lane) tile."""
    n, w2 = x.shape
    g = _CHUNK_GROUP
    assert s64 % g == 0 and w2 == s64 * BBITS * 2
    xg = x.reshape(n, s64 // g, g * BBITS * 2)
    xg = jnp.pad(xg, ((0, 0), (0, 0), (0, 128 - g * BBITS * 2)))
    return xg.reshape(n, (s64 // g) * 128)


def _samebits_chunked_kernel(
    a_ref, bt_ref, out_ref, acc_ref, *, s64: int, ti: int, tj: int
):
    c = pl.program_id(2)
    g = _CHUNK_GROUP
    counts = jnp.zeros((ti, tj), dtype=jnp.int32)
    full = jnp.full((ti, tj), 0xFFFFFFFF, dtype=jnp.uint32)
    for cg in range(g):
        for w in range(2):
            acc = full
            for p in range(BBITS):
                widx = cg * (BBITS * 2) + p * 2 + w
                a_col = a_ref[:, widx : widx + 1]  # (ti, 1)
                b_row = bt_ref[widx : widx + 1, :]  # (1, tj)
                acc = acc & ~(a_col ^ b_row)
            counts = counts + jax.lax.population_count(acc).astype(jnp.int32)

    @pl.when(c == 0)
    def _init():
        acc_ref[:, :] = counts

    @pl.when(c != 0)
    def _accum():
        acc_ref[:, :] = acc_ref[:, :] + counts

    @pl.when(c == s64 // g - 1)
    def _finish():
        out_ref[:, :] = acc_ref[:, :]


@functools.partial(jax.jit, static_argnames=("s64", "ti", "tj", "interpret"))
def samebits_pallas_chunked(
    a: jnp.ndarray,  # (na, (s64/G)*128) u32, chunk-group-major layout
    bt: jnp.ndarray,  # ((s64/G)*128, nb) u32 (transposed, same layout)
    s64: int,
    ti: int = 512,
    tj: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(na, nb) int32 samebits via a VMEM-blocked outer-product kernel.

    Each A row block / B^T column block is read from HBM once per grid
    tile and reused across the whole (ti, tj) output block. Honest
    salt-chained A/B on TPU v5e: as a STANDALONE tile the XLA fusion path
    is actually faster (3.5 vs 2.8 G pair/s at 2048x8192, s64=16), but
    inside the kNN scan loop this kernel wins (packed scan 1.69 XLA ->
    2.34 G pair/s Pallas) — XLA fuses the mask/top-k consumers more
    efficiently around an opaque kernel than around its own fusion."""
    na = a.shape[0]
    nb = bt.shape[1]
    g = _CHUNK_GROUP
    if na % ti or nb % tj or s64 % g:
        raise ValueError(
            "samebits_pallas_chunked needs shapes divisible by its tiles: "
            f"na={na} % ti={ti}, nb={nb} % tj={tj}, s64={s64} % {g} "
            "(a flooring grid would silently leave trailing blocks "
            "unwritten)"
        )
    grid = (na // ti, nb // tj, s64 // g)
    return pl.pallas_call(
        functools.partial(_samebits_chunked_kernel, s64=s64, ti=ti, tj=tj),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ti, 128), lambda i, j, c: (i, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (128, tj), lambda i, j, c: (c, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ti, tj), lambda i, j, c: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((na, nb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ti, tj), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=na * nb * (BBITS * 2 + 2) * s64 * 2,
            bytes_accessed=(na * 128 * (s64 // g) + nb * 128 * (s64 // g) + na * nb)
            * 4,
            transcendentals=0,
        ),
    )(a, bt)


def _samebits_strip_kernel(
    row0_ref, a_ref, bt_ref, out_ref, acc_ref, *, s64: int, tri: bool
):
    c = pl.program_id(2)
    g = _CHUNK_GROUP
    ti, tj = out_ref.shape

    if tri:
        # self-dense triangle skip at (ti, tj) granularity: a block whose
        # largest column <= smallest global row holds no upper-triangle
        # pair (consumers only read cols > row), so it just emits zeros
        # at the last grid step. Finer than the old strip x column-tile
        # cond, so strictly fewer pairs are computed.
        i = pl.program_id(0)
        j = pl.program_id(1)
        skip = (j + 1) * tj - 1 <= row0_ref[0, 0] + i * ti
        work = jnp.logical_not(skip)

    def _compute():
        counts = jnp.zeros((ti, tj), dtype=jnp.int32)
        full = jnp.full((ti, tj), 0xFFFFFFFF, dtype=jnp.uint32)
        for cg in range(g):
            for w in range(2):
                acc = full
                for p in range(BBITS):
                    widx = cg * (BBITS * 2) + p * 2 + w
                    a_col = a_ref[:, widx : widx + 1]  # (ti, 1)
                    b_row = bt_ref[widx : widx + 1, :]  # (1, tj)
                    acc = acc & ~(a_col ^ b_row)
                counts = counts + jax.lax.population_count(acc).astype(
                    jnp.int32
                )

        @pl.when(c == 0)
        def _init():
            acc_ref[:, :] = counts

        @pl.when(c != 0)
        def _accum():
            acc_ref[:, :] = acc_ref[:, :] + counts

        @pl.when(c == s64 // g - 1)
        def _finish():
            out_ref[:, :] = acc_ref[:, :].astype(jnp.int16)

    if tri:
        pl.when(work)(_compute)

        @pl.when(jnp.logical_and(c == s64 // g - 1, skip))
        def _zero_skipped():
            out_ref[:, :] = jnp.zeros((ti, tj), jnp.int16)
    else:
        _compute()


@functools.partial(
    jax.jit, static_argnames=("s64", "ti", "tj", "tri", "interpret")
)
def samebits_strip_fused(
    a: jnp.ndarray,  # (blk, (s64/G)*128) u32, chunk-group-major layout
    bt: jnp.ndarray,  # ((s64/G)*128, n) u32 (transposed, same layout)
    s64: int,
    row0: jnp.ndarray | None = None,  # () i32 global row offset (tri mode)
    ti: int = 512,
    tj: int = 512,
    tri: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(blk, n) int16 samebits strip in ONE pallas_call: grid over row
    blocks x column blocks x chunk groups, int32 VMEM accumulator, int16
    written directly in strip layout.

    This replaces the round-4 scan-of-2048-column-tiles strip
    (jaccard_jax._samebits_strip_pallas body pre-round-5), whose schedule
    kept only 68% of the isolated tile rate: each scan step materialized a
    (blk, tc) int32 tile to HBM (16 MB), re-read it for the int16 convert,
    stacked into (n_tiles, blk, tc), and paid a final transposing reshape
    of the whole ~400 MB strip. Here the accumulator stays in VMEM, the
    only HBM output traffic is the int16 strip written once in its final
    layout, and there is no dynamic-slice / scan / cond machinery.

    samebits <= s64*64 <= 2^15 for any practical sketch size, so int16 is
    exact (same contract as the strip it replaces)."""
    blk = a.shape[0]
    n = bt.shape[1]
    g = _CHUNK_GROUP
    if blk % ti or n % tj or s64 % g:
        raise ValueError(
            "samebits_strip_fused needs shapes divisible by its tiles: "
            f"blk={blk} % ti={ti}, n={n} % tj={tj}, s64={s64} % {g}"
        )
    grid = (blk // ti, n // tj, s64 // g)
    row0_arg = jnp.asarray(
        0 if row0 is None else row0, jnp.int32
    ).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_samebits_strip_kernel, s64=s64, tri=tri),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1), lambda i, j, c: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (ti, 128), lambda i, j, c: (i, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (128, tj), lambda i, j, c: (c, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ti, tj), lambda i, j, c: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((blk, n), jnp.int16),
        scratch_shapes=[pltpu.VMEM((ti, tj), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=blk * n * (BBITS * 2 + 2) * s64 * 2,
            bytes_accessed=(blk * 128 * (s64 // g) + n * 128 * (s64 // g))
            * 4
            + blk * n * 2,
            transcendentals=0,
        ),
    )(row0_arg, a, bt)


def _samebits_kernel(a_ref, bt_ref, out_ref, *, s64: int, ti: int, tj: int):
    counts = jnp.zeros((ti, tj), dtype=jnp.int32)
    full = jnp.full((ti, tj), 0xFFFFFFFF, dtype=jnp.uint32)
    for c in range(s64):
        for w in range(2):
            acc = full
            for p in range(BBITS):
                widx = c * (BBITS * 2) + p * 2 + w
                a_col = a_ref[:, widx : widx + 1]  # (ti, 1)
                b_row = bt_ref[widx : widx + 1, :]  # (1, tj)
                acc = acc & ~(a_col ^ b_row)
            counts = counts + jax.lax.population_count(acc).astype(jnp.int32)
    out_ref[:, :] = counts


@functools.partial(jax.jit, static_argnames=("s64", "ti", "tj", "interpret"))
def samebits_pallas(
    a: jnp.ndarray,  # (na, W2) u32
    bt: jnp.ndarray,  # (W2, nb) u32 (transposed queries)
    s64: int,
    ti: int = 256,
    tj: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    na, w2 = a.shape
    nb = bt.shape[1]
    grid = (na // ti, nb // tj)
    return pl.pallas_call(
        functools.partial(_samebits_kernel, s64=s64, ti=ti, tj=tj),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ti, w2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ti, tj), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((na, nb), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=na * nb * (BBITS * 2 + 2) * s64 * 2,
            bytes_accessed=(na * w2 + nb * w2 + na * nb) * 4,
            transcendentals=0,
        ),
    )(a, bt)
