"""Fused multi-k core/accessory Pallas TPU kernel.

The XLA path (coreacc_jax.coreacc_tile) computes one samebits tile per
k-mer length and lets XLA fuse the regression chain; at scale the per-k
(na, nb, words) plane-mask intermediates spill to HBM and the tile runs
at ~40% of the VPU samebits rate. This kernel fuses the WHOLE per-pair
chain — 14-plane XNOR/AND samebits for every k, the Jaccard bias
correction, ln, the reference's early-break inclusion rule and the
closed-form log-linear regression (jaccard.rs:61-142 in the reference) —
with nothing but the sketch blocks and the two (na, nb) f32 outputs ever
touching HBM.

Structure: grid (na/ti, nb/tj, s64/G) with a G-chunk group axis innermost.
Sketch words are relaid out group-major ([group][chunk][k][plane][lo,hi],
each group zero-padded to a 128-word multiple) so each grid step reads one
contiguous (ti, wcg)/(wcg, tj) block; per-k samebits accumulate in VMEM
scratch across group steps (re-initialised at c==0), and the float chain
runs once at the last group. G is the divisor of s64 that minimises the
128-lane padding waste under a Mosaic unroll budget (one chunk per step
padded nk*28=196 -> 256 words at nk=7, wasting 23% of block bandwidth;
G=8 groups pad 1568 -> 1664, 5.8%). The earlier whole-tile unroll (no
group axis) spilled 150 MB of vregs.

Math identical to coreacc_jax.coreacc_tile (f32); agreement with the f64
host oracle is ~1e-5 absolute, far inside the reference's own 0.05
accuracy gate (tests/distance.rs:16-30).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BBITS

_WPC = BBITS * 2  # u32 words per (chunk, k): 14 planes x {lo, hi}


_UNROLL_BUDGET = 1664  # max u32 words ANDed per grid step (Mosaic unroll)


@functools.lru_cache(maxsize=None)
def _pick_group(s64: int, nk: int) -> int:
    """Chunks per grid step (SKETCHTPU_COREACC_GROUP overrides, must be >= 1,
    divide s64 and fit the unroll budget).

    Default 1. Grouping chunks cuts the 128-lane zero padding of each block
    (nk=7: 196 -> 256 words/chunk wastes 23%; G=8 groups pad 1568 -> 1664,
    5.8%) but MEASURED SLOWER on TPU v5e: RTT-cancelled salt-chained probe
    at ti=128/tj=512/nk=7 gives G=1 459 M pair/s vs G=4 ~430 / G=8 351 —
    the kernel is VPU-compute-bound, padded lanes cost only HBM block
    bandwidth (which has slack), and the larger per-step unroll hurts
    Mosaic's schedule (G=8 also compiles ~60x slower).

    Cached per (s64, nk) so the layout pass (chunk_major, possibly cached by
    callers) and the jit trace always see the same group factor even if the
    env var changes mid-process."""
    import logging
    import os

    env = os.environ.get("SKETCHTPU_COREACC_GROUP")
    if env:
        g = int(env)
        if g >= 1 and s64 % g == 0 and g * nk * _WPC <= _UNROLL_BUDGET:
            return g
        logging.getLogger(__name__).warning(
            "SKETCHTPU_COREACC_GROUP=%s rejected (must be >= 1, divide "
            "s64=%d, and keep g*nk*%d <= %d); using G=1",
            env, s64, _WPC, _UNROLL_BUDGET,
        )
    return 1


def _group_words_padded(s64: int, nk: int) -> tuple[int, int]:
    """(G, padded words per G-chunk group) so Pallas blocks tile as
    (sublane x 128-lane)."""
    g = _pick_group(s64, nk)
    return g, -(-g * nk * _WPC // 128) * 128


def chunk_major(stack: jnp.ndarray, s64: int) -> jnp.ndarray:
    """(nk, n, W2) u32 [k][chunk][plane][w] -> (n, (s64/G)*wcg) group-major,
    each G-chunk [chunk][k] word group zero-padded to a 128-word multiple."""
    nk, n, w2 = stack.shape
    g, wcg = _group_words_padded(s64, nk)
    x = stack.reshape(nk, n, s64, _WPC).transpose(1, 2, 0, 3)
    x = x.reshape(n, s64 // g, g * nk * _WPC)
    pad = wcg - g * nk * _WPC
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x.reshape(n, (s64 // g) * wcg)


def _coreacc_kernel(
    *refs,
    s64: int,
    kmers: tuple[int, ...],
    maxnbits: float,
    expected: float,
    tolerance: float,
    cutoff: float | None = None,
    tri: bool = False,
):
    if tri:
        row0_ref, *refs = refs
    a_ref, bt_ref, *rest_refs = refs
    if cutoff is not None:
        c1_ref, c2_ref, core_ref, acc_ref, *counts_refs = rest_refs
    else:
        core_ref, acc_ref, *counts_refs = rest_refs
    c = pl.program_id(2)
    nk = len(kmers)
    g = s64 // pl.num_programs(2)
    ti = core_ref.shape[0]
    tj = core_ref.shape[1]
    full = jnp.full((ti, tj), 0xFFFFFFFF, dtype=jnp.uint32)

    if tri:
        # self-dense triangle skip: this (ti, tj) block contributes no
        # upper-triangle pair iff its largest column <= its smallest
        # global row — the writer only ever reads cols > row, so skipped
        # blocks just emit zeros at the last grid step. The kernel is
        # VPU-compute-bound; gating the AND-chains halves dense-self
        # compute even though block copies still stream
        i = pl.program_id(0)
        j = pl.program_id(1)
        skip = (j + 1) * tj - 1 <= row0_ref[0, 0] + i * ti
        work = jnp.logical_not(skip)
    else:
        work = None

    def _compute_all_k():
        for ki in range(nk):
            sb = jnp.zeros((ti, tj), jnp.int32)
            for cg in range(g):
                for w in range(2):
                    acc = full
                    for p in range(BBITS):
                        widx = (cg * nk + ki) * _WPC + p * 2 + w
                        a_col = a_ref[:, widx : widx + 1]  # (ti, 1)
                        b_row = bt_ref[widx : widx + 1, :]  # (1, tj)
                        acc = acc & ~(a_col ^ b_row)
                    sb = sb + jax.lax.population_count(acc).astype(jnp.int32)

            @pl.when(c == 0)
            def _init():
                counts_refs[ki][:, :] = sb

            @pl.when(c != 0)
            def _accum():
                counts_refs[ki][:, :] = counts_refs[ki][:, :] + sb

    if tri:
        pl.when(work)(_compute_all_k)

        @pl.when(jnp.logical_and(c == s64 // g - 1, skip))
        def _zero_skipped():
            core_ref[:, :] = jnp.zeros((ti, tj), jnp.float32)
            acc_ref[:, :] = jnp.zeros((ti, tj), jnp.float32)

        finish_cond = jnp.logical_and(c == s64 // g - 1, work)
    else:
        _compute_all_k()
        finish_cond = c == s64 // g - 1

    @pl.when(finish_cond)
    def _finish():
        shape = (ti, tj)
        zero = jnp.zeros(shape, jnp.float32)
        xsum, ysum, xysum, xsq, ysq, n = zero, zero, zero, zero, zero, zero
        still = jnp.ones(shape, jnp.bool_)
        if cutoff is not None:
            c1v = c1_ref[:, :]  # (ti, 1)
            c2v = c2_ref[:, :]  # (1, tj)
            prod = c1v * c2v
            factor = prod / (c1v + c2v - prod)
            capply = prod >= jnp.float32(cutoff)
        for ki, k in enumerate(kmers):
            sb_f = counts_refs[ki][:, :].astype(jnp.float32)
            diff = jnp.maximum(sb_f - expected, 0.0)
            j = (diff * maxnbits / (maxnbits - expected)) / maxnbits
            if cutoff is not None:
                j = jnp.where(capply, jnp.minimum(j / factor, 1.0), j)
            y = jnp.log(j)
            still = still & (y >= tolerance)
            k_fl = jnp.float32(k)
            yk = jnp.where(still, y, 0.0)
            xsum = xsum + jnp.where(still, k_fl, 0.0)
            ysum = ysum + yk
            xysum = xysum + k_fl * yk
            xsq = xsq + jnp.where(still, k_fl * k_fl, 0.0)
            ysq = ysq + yk * yk
            n = n + still.astype(jnp.float32)

        xbar = xsum / n
        ybar = ysum / n
        x_diff = xsq - xsum * xsum / n
        y_diff = ysq - ysum * ysum / n
        beta = (xysum - xsum * ysum / n) / x_diff
        alpha = -beta * xbar + ybar

        core = jnp.where(
            beta < 0.0, 1.0 - jnp.exp(beta), jnp.where(beta > 0.0, 1.0, 0.0)
        )
        acc_d = jnp.where(alpha < 0.0, 1.0 - jnp.exp(alpha), 0.0)
        degenerate = y_diff <= 0.0
        core = jnp.where(degenerate, 0.0, core)
        acc_d = jnp.where(degenerate, 0.0, acc_d)
        bad = jnp.isnan(ysum) | jnp.isneginf(ysum) | (n < 3.0)
        core_ref[:, :] = jnp.where(bad, 1.0, core)
        acc_ref[:, :] = jnp.where(bad, 1.0, acc_d)


@functools.partial(
    jax.jit,
    static_argnames=(
        "s64", "kmers", "sketch_size", "ti", "tj", "interpret", "cutoff",
        "tri",
    ),
)
def coreacc_pallas(
    a: jnp.ndarray,  # (na, (s64/G)*wcg) u32 group-major from chunk_major()
    bt: jnp.ndarray,  # ((s64/G)*wcg, nb) u32 (chunk_major output transposed);
    #   wcg = g*nk*28 zero-padded to a 128 multiple (_group_words_padded)
    s64: int,
    kmers: tuple[int, ...],
    sketch_size: int,
    ti: int = 256,
    tj: int = 512,
    interpret: bool = False,
    c1: jnp.ndarray | None = None,  # (na,) f32 row completeness
    c2: jnp.ndarray | None = None,  # (nb,) f32 column completeness
    cutoff: float = 0.64,
    tri: bool = False,
    row0: jnp.ndarray | None = None,  # () i32 global row offset (tri mode)
) -> jnp.ndarray:
    """Returns (na, nb, 2) f32 core and accessory distances.

    na must be a multiple of ti and nb of tj (callers pad; padded rows are
    discarded by the caller). c1/c2 apply the MAG completeness correction
    to each per-k Jaccard inside the final grid step (the factor is
    constant over k). tri=True (self-dense row blocks, rows globally at
    row0) zeroes and SKIPS compute for blocks entirely below the
    diagonal — the writer only reads cols > row — roughly halving the
    all-vs-all device time."""
    na = a.shape[0]
    nb = bt.shape[1]
    nk = len(kmers)
    g, wc = _group_words_padded(s64, nk)
    maxnbits = float(s64 * 64)
    expected = float(int(s64 * 64) >> BBITS)
    tolerance = float(np.log(2.0 / float(sketch_size * 64)))
    grid = (na // ti, nb // tj, s64 // g)
    comp = c1 is not None
    kernel = functools.partial(
        _coreacc_kernel,
        s64=s64,
        kmers=kmers,
        maxnbits=maxnbits,
        expected=expected,
        tolerance=tolerance,
        cutoff=cutoff if comp else None,
        tri=tri,
    )
    in_specs = [
        pl.BlockSpec((ti, wc), lambda i, j, c: (i, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((wc, tj), lambda i, j, c: (c, j), memory_space=pltpu.VMEM),
    ]
    operands = [a, bt]
    if tri:
        in_specs.insert(
            0,
            pl.BlockSpec(
                (1, 1), lambda i, j, c: (0, 0), memory_space=pltpu.SMEM
            ),
        )
        operands.insert(
            0, jnp.asarray(0 if row0 is None else row0, jnp.int32).reshape(1, 1)
        )
    if comp:
        in_specs += [
            pl.BlockSpec(
                (ti, 1), lambda i, j, c: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tj), lambda i, j, c: (0, j), memory_space=pltpu.VMEM
            ),
        ]
        operands += [c1.reshape(na, 1), c2.reshape(1, nb)]
    core, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((ti, tj), lambda i, j, c: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, tj), lambda i, j, c: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((na, nb), jnp.float32),
            jax.ShapeDtypeStruct((na, nb), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((ti, tj), jnp.int32) for _ in range(nk)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=na * nb * nk * (BBITS * 2 + 2) * s64 * 2,
            bytes_accessed=(
                (na + nb) * (s64 // g) * wc + 2 * na * nb
            ) * 4,
            transcendentals=na * nb * nk,
        ),
    )(*operands)
    return jnp.stack([core, acc], axis=-1)
