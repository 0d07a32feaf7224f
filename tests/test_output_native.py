"""Native bulk formatter parity vs the pure-Python writers.

The native path must be byte-identical: per-value formatting (shortest
round-trip f32, positional notation — Rust Display semantics) and whole
line assembly for dense/sparse layouts.
"""

import io

import numpy as np
import pytest

from sketchtpu._native import get_lib
from sketchtpu.dist import output as O

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _interesting_floats():
    """Values in the printable domain: every distance/similarity the
    reference emits is in [0, 1] (plus NaN for degenerate ANI). For values
    >= 2^24 numpy's dragon4 prints the exact integer while Ryu/to_chars
    prints the shortest round-trip — both algorithms agree on [0, 1]
    (verified over millions of random bit patterns, incl. subnormals)."""
    rng = np.random.default_rng(0)
    vals = [
        0.0, 1.0, -1.0, 0.5, 0.1, 1e-8, 1.17549435e-38,
        0.012206846, 0.09578865, -2.5e-12,
        float("nan"), float("inf"), float("-inf"),
    ]
    vals += list(rng.random(2000).astype(np.float32))
    vals += list((rng.random(500) * 1e-6).astype(np.float32))
    # random bit patterns across the full [0, 1) exponent range
    bits = rng.integers(0, 0x3F800001, 20000, dtype=np.uint32).view(
        np.float32
    )
    vals += [v for v in bits if np.isfinite(v)]
    return np.array(vals, dtype=np.float32)


@needs_native
def test_fmt_f32_native_parity():
    vals = _interesting_floats()
    got = O.fmt_f32_column(vals)
    want = [O.fmt_f32(v) for v in vals]
    assert got == want


@needs_native
def test_write_dense_self_parity():
    rng = np.random.default_rng(1)
    names = [f"sample_{i}" for i in range(13)]
    n_pairs = 13 * 12 // 2
    for coreacc in (False, True):
        d = rng.random((n_pairs, 2)).astype(np.float32) if coreacc else (
            rng.random(n_pairs).astype(np.float32)
        )
        fast, slow = io.StringIO(), io.StringIO()
        O.write_dense_self(fast, names, d, coreacc)
        O._write_dense_self_py(slow, names, d, coreacc)
        assert fast.getvalue() == slow.getvalue()


@needs_native
def test_write_sparse_arrays_parity():
    from sketchtpu.dist.knn_jax import SparseKnnRows

    rng = np.random.default_rng(2)
    n, knn = 37, 5
    names = [f"g{i}" for i in range(n)]
    idx = rng.integers(0, n, (n, knn)).astype(np.int32)
    idx[0, 0] = 0  # a self pair
    for coreacc in (False, True):
        if coreacc:
            vals = rng.random((n, knn, 2)).astype(np.float32)
            valid = None
        else:
            vals = rng.random((n, knn)).astype(np.float32)
            vals[0, 0] = 1.0  # self + dist 1.0 -> print-skipped padding
            vals[3, 4] = 1.0  # dist 1.0 but non-self -> printed
            valid = rng.random((n, knn)) < 0.9
        rows = SparseKnnRows(idx, vals, valid)
        fast, slow = io.StringIO(), io.StringIO()
        O.write_sparse(fast, names, names, rows, coreacc)
        O.write_sparse(slow, names, names, list(rows), coreacc)
        assert fast.getvalue() == slow.getvalue()
