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
