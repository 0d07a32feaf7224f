"""On-device f32 core/accessory tiles vs the exact f64 host pipeline."""

import numpy as np

import jax.numpy as jnp

from sketchtpu.dist.coreacc_jax import coreacc_tile
from sketchtpu.dist.jaccard_np import (
    core_acc_from_jaccards,
    jaccard_from_samebits,
    samebits_matrix,
)


def test_coreacc_tile_matches_host():
    rng = np.random.default_rng(0)
    s64 = 16
    w = s64 * 14
    kmers = (17, 21, 25, 29)
    na, nb = 24, 16
    sketch_size = 1024

    # correlated sketches so some pairs have meaningful multi-k signal
    base = rng.integers(0, 2**63, (1, len(kmers), w), dtype=np.uint64)
    a = np.where(
        rng.random((na, len(kmers), w)) < 0.7,
        base,
        rng.integers(0, 2**63, (na, len(kmers), w), dtype=np.uint64),
    )
    b = np.where(
        rng.random((nb, len(kmers), w)) < 0.7,
        base,
        rng.integers(0, 2**63, (nb, len(kmers), w), dtype=np.uint64),
    )
    # include an identical pair (y == 0 for all k: degenerate regression)
    b[0] = a[0]

    # host pipeline
    jaccs = np.empty((na * nb, len(kmers)))
    for ki in range(len(kmers)):
        sb = samebits_matrix(
            np.ascontiguousarray(a[:, ki]), np.ascontiguousarray(b[:, ki])
        ).reshape(-1)
        jaccs[:, ki] = jaccard_from_samebits(sb, s64)
    core_h, acc_h = core_acc_from_jaccards(jaccs, list(kmers), sketch_size)

    # device pipeline
    a_stack = jnp.asarray(
        np.ascontiguousarray(a.transpose(1, 0, 2)).view(np.uint32)
    )
    b_stack = jnp.asarray(
        np.ascontiguousarray(b.transpose(1, 0, 2)).view(np.uint32)
    )
    out = np.asarray(coreacc_tile(a_stack, b_stack, s64, kmers, sketch_size))
    core_d = out[:, :, 0].reshape(-1)
    acc_d = out[:, :, 1].reshape(-1)

    np.testing.assert_allclose(core_d, core_h, atol=2e-4)
    np.testing.assert_allclose(acc_d, acc_h, atol=2e-4)


def test_coreacc_pallas_matches_xla_tile():
    """The fused multi-k Pallas kernel (interpret mode on CPU) must agree
    exactly with the XLA coreacc_tile path on identical inputs, including
    degenerate pairs (identical sketches) and no-fit pairs (all-random)."""
    from sketchtpu.dist.coreacc_pallas import chunk_major, coreacc_pallas

    rng = np.random.default_rng(1)
    s64 = 2
    w2 = s64 * 14 * 2
    kmers = (17, 21, 25, 29)
    nk = len(kmers)
    n = 16
    base = rng.integers(0, 2**32, (n, w2), dtype=np.uint32)
    stack = np.empty((nk, n, w2), dtype=np.uint32)
    for ki in range(nk):
        mask = (rng.random((n, w2)) < 0.05 * ki).astype(np.uint32) * rng.integers(
            0, 2**32, (n, w2), dtype=np.uint32
        )
        stack[ki] = base ^ mask
    stack[:, -1] = stack[:, 0]  # identical pair
    ref = np.asarray(
        coreacc_tile(jnp.asarray(stack), jnp.asarray(stack), s64, kmers, 128)
    )
    a = np.asarray(chunk_major(jnp.asarray(stack), s64))
    got = np.asarray(
        coreacc_pallas(
            jnp.asarray(a), jnp.asarray(a.T), s64, kmers, 128, ti=8, tj=8,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)
