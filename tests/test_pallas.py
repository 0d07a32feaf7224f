"""Pallas kernel parity (interpret mode on CPU; the compiled kernel was
verified on real TPU v5e hardware)."""

import numpy as np

import jax.numpy as jnp

import pytest

from sketchtpu.dist.jaccard_np import samebits_matrix
from sketchtpu.dist.pallas_kernels import (
    chunk_group_major,
    samebits_pallas,
    samebits_pallas_chunked,
)


def test_samebits_pallas_interpret():
    s64 = 16
    w2 = s64 * 14 * 2
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 2**32, (256, w2), dtype=np.uint32)
    b_np = rng.integers(0, 2**32, (512, w2), dtype=np.uint32)
    got = np.asarray(
        samebits_pallas(
            jnp.asarray(a_np),
            jnp.asarray(np.ascontiguousarray(b_np.T)),
            s64,
            ti=256,
            tj=512,
            interpret=True,
        )
    )
    want = samebits_matrix(a_np.view(np.uint64), b_np.view(np.uint64))
    assert np.array_equal(got, want)


def test_samebits_pallas_chunked_interpret():
    s64 = 16
    w2 = s64 * 14 * 2
    rng = np.random.default_rng(1)
    a_np = rng.integers(0, 2**32, (256, w2), dtype=np.uint32)
    b_np = rng.integers(0, 2**32, (1024, w2), dtype=np.uint32)
    a_cm = chunk_group_major(jnp.asarray(a_np), s64)
    b_cm = chunk_group_major(jnp.asarray(b_np), s64)
    got = np.asarray(
        samebits_pallas_chunked(
            a_cm,
            jnp.transpose(b_cm),
            s64,
            ti=256,
            tj=1024,
            interpret=True,
        )
    )
    want = samebits_matrix(a_np.view(np.uint64), b_np.view(np.uint64))
    assert np.array_equal(got, want)


def test_samebits_pallas_chunked_rejects_ragged_tiles():
    s64 = 16
    a = jnp.zeros((100, (s64 // 4) * 128), jnp.uint32)
    bt = jnp.zeros(((s64 // 4) * 128, 256), jnp.uint32)
    with pytest.raises(ValueError, match="divisible"):
        samebits_pallas_chunked(a, bt, s64, ti=256, tj=256, interpret=True)
