"""Pallas kernel parity (interpret mode on CPU; the compiled kernel was
verified on real TPU v5e hardware)."""

import numpy as np

import jax.numpy as jnp

from sketchtpu.dist.jaccard_np import samebits_matrix
from sketchtpu.dist.pallas_kernels import samebits_pallas


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
