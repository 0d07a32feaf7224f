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


def test_samebits_strip_fused_interpret():
    """The whole-strip fused kernel (round 5, now the production
    _samebits_strip_pallas body) must be bit-exact vs the XLA samebits
    tile, write int16 in strip layout, and — with tri=True at any row0 —
    preserve every upper-triangle (col > row) entry while zeroing blocks
    wholly at-or-below the diagonal at (512, 512) granularity."""
    from sketchtpu.dist.pallas_kernels import samebits_strip_fused

    s64 = 4
    w2 = s64 * 14 * 2
    rng = np.random.default_rng(5)
    n, blk = 1024, 512
    mat = rng.integers(0, 2**32, (n, w2), dtype=np.uint32)
    cm = chunk_group_major(jnp.asarray(mat), s64)
    cm_t = jnp.transpose(cm)
    want = samebits_matrix(
        mat[:blk].view(np.uint64), mat.view(np.uint64)
    ).astype(np.int16)
    got = np.asarray(
        samebits_strip_fused(cm[:blk], cm_t, s64, interpret=True)
    )
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, want)
    for row0 in (0, 512):
        tri = np.asarray(
            samebits_strip_fused(
                cm[:blk], cm_t, s64, row0=jnp.int32(row0), tri=True,
                interpret=True,
            )
        )
        rows = row0 + np.arange(blk)[:, None]
        cols = np.arange(n)[None, :]
        upper = cols > rows
        np.testing.assert_array_equal(tri[upper], want[upper])
        for i in range(blk // 512):
            for j in range(n // 512):
                if (j + 1) * 512 - 1 <= row0 + i * 512:
                    np.testing.assert_array_equal(
                        tri[i * 512:(i + 1) * 512, j * 512:(j + 1) * 512],
                        0,
                    )


def test_knn_scan_block_pallas_matches_xla_interpret():
    """The Pallas-tile kNN scan must select identically to the XLA scan
    (same valid-mask / group-shrink / top-k merge around the tile)."""
    from sketchtpu.dist.knn_jax import (
        _knn_scan_block,
        _knn_scan_block_pallas,
    )
    from sketchtpu.dist.pallas_kernels import chunk_group_major

    s64 = 4
    w2 = s64 * 14 * 2
    rng = np.random.default_rng(2)
    nb = 512
    tr = 256
    knn = 5
    a_np = rng.integers(0, 2**32, (tr, w2), dtype=np.uint32)
    b_np = rng.integers(0, 2**32, (nb, w2), dtype=np.uint32)
    b_np[:tr] = a_np  # rows are a slice of columns: self-exclusion matters
    sig = np.zeros((tr, 1), np.int32)
    bsig = np.zeros((nb, 1), np.int32)
    want_v, want_i = _knn_scan_block(
        jnp.asarray(a_np), jnp.asarray(b_np), np.int32(0), np.int32(nb - 3),
        sig, bsig, s64=s64, knn=knn, tc=256, exclude_self=True, masked=False,
    )
    got_v, got_i = _knn_scan_block_pallas(
        chunk_group_major(jnp.asarray(a_np), s64),
        jnp.transpose(chunk_group_major(jnp.asarray(b_np), s64)),
        np.int32(0), np.int32(nb - 3),
        sig, bsig, s64=s64, knn=knn, tc=256, exclude_self=True, masked=False,
        ti=256, tj=256, interpret=True,
    )
    assert np.array_equal(np.asarray(got_v), np.asarray(want_v))
    assert np.array_equal(np.asarray(got_i), np.asarray(want_i))


def test_knn_scan_block_packed_matches_reference_scan():
    """The packed-key fast scan (branch-gated masks, single-top_k merge)
    must select identically — values, indices, tie order — to the original
    scan, in both its XLA and Pallas tile flavours."""
    from sketchtpu.dist.knn_jax import (
        _knn_scan_block,
        _knn_scan_block_packed,
    )
    from sketchtpu.dist.pallas_kernels import chunk_group_major

    s64 = 4
    w2 = s64 * 14 * 2
    rng = np.random.default_rng(4)
    nb = 512
    tr = 256
    knn = 5
    a_np = rng.integers(0, 2**32, (tr, w2), dtype=np.uint32)
    b_np = rng.integers(0, 2**32, (nb, w2), dtype=np.uint32)
    b_np[:tr] = a_np  # diagonal overlap: exercises the self-exclusion branch
    # duplicate columns: exercises tie-breaking (must prefer lowest column)
    b_np[300] = b_np[10]
    b_np[301] = b_np[10]
    sig = np.zeros((tr, 1), np.int32)
    bsig = np.zeros((nb, 1), np.int32)
    for nb_real in (nb, nb - 3):  # with and without padded tail columns
        want_v, want_i = _knn_scan_block(
            jnp.asarray(a_np), jnp.asarray(b_np), np.int32(0),
            np.int32(nb_real), sig, bsig,
            s64=s64, knn=knn, tc=256, exclude_self=True, masked=False,
        )
        got_v, got_i = _knn_scan_block_packed(
            jnp.asarray(a_np), jnp.asarray(b_np), np.int32(0),
            np.int32(nb_real),
            s64=s64, knn=knn, tc=256, exclude_self=True, pallas=False,
        )
        assert np.array_equal(np.asarray(got_v), np.asarray(want_v))
        assert np.array_equal(np.asarray(got_i), np.asarray(want_i))
        got_v, got_i = _knn_scan_block_packed(
            chunk_group_major(jnp.asarray(a_np), s64),
            jnp.transpose(chunk_group_major(jnp.asarray(b_np), s64)),
            np.int32(0), np.int32(nb_real),
            s64=s64, knn=knn, tc=256, exclude_self=True, pallas=True,
            ti=256, tj=256, interpret=True,
        )
        assert np.array_equal(np.asarray(got_v), np.asarray(want_v))
        assert np.array_equal(np.asarray(got_i), np.asarray(want_i))


def test_knn_scan_block_packed_masked_matches_reference_scan():
    """Packed scan in masked (precluster sign-equality prefilter) mode."""
    from sketchtpu.dist.knn_jax import (
        _knn_scan_block,
        _knn_scan_block_packed,
    )
    from sketchtpu.dist.pallas_kernels import chunk_group_major

    s64 = 4
    w2 = s64 * 14 * 2
    rng = np.random.default_rng(5)
    nb = 512
    tr = 256
    knn = 5
    S = 16
    a_np = rng.integers(0, 2**32, (tr, w2), dtype=np.uint32)
    b_np = rng.integers(0, 2**32, (nb, w2), dtype=np.uint32)
    b_np[:tr] = a_np
    b_sig = rng.integers(0, 8, (nb, S)).astype(np.int32)  # dense collisions
    a_sig = b_sig[:tr]
    want_v, want_i = _knn_scan_block(
        jnp.asarray(a_np), jnp.asarray(b_np), np.int32(0), np.int32(nb - 3),
        a_sig, b_sig,
        s64=s64, knn=knn, tc=256, exclude_self=True, masked=True,
    )
    got_v, got_i = _knn_scan_block_packed(
        jnp.asarray(a_np), jnp.asarray(b_np), np.int32(0), np.int32(nb - 3),
        s64=s64, knn=knn, tc=256, exclude_self=True, pallas=False,
        a_sig=a_sig, b_sig=b_sig, masked=True,
    )
    assert np.array_equal(np.asarray(got_v), np.asarray(want_v))
    assert np.array_equal(np.asarray(got_i), np.asarray(want_i))
    got_v, got_i = _knn_scan_block_packed(
        chunk_group_major(jnp.asarray(a_np), s64),
        jnp.transpose(chunk_group_major(jnp.asarray(b_np), s64)),
        np.int32(0), np.int32(nb - 3),
        s64=s64, knn=knn, tc=256, exclude_self=True, pallas=True,
        a_sig=a_sig, b_sig=b_sig, masked=True,
        ti=256, tj=256, interpret=True,
    )
    assert np.array_equal(np.asarray(got_v), np.asarray(want_v))
    assert np.array_equal(np.asarray(got_i), np.asarray(want_i))


def test_knn_scan_block_comp_pallas_matches_xla_interpret():
    from sketchtpu.dist.knn_jax import (
        _knn_scan_block_comp,
        _knn_scan_block_comp_pallas,
    )
    from sketchtpu.dist.pallas_kernels import chunk_group_major

    s64 = 4
    w2 = s64 * 14 * 2
    rng = np.random.default_rng(3)
    nb = 512
    tr = 256
    knn = 5
    a_np = rng.integers(0, 2**32, (tr, w2), dtype=np.uint32)
    b_np = rng.integers(0, 2**32, (nb, w2), dtype=np.uint32)
    b_np[:tr] = a_np
    sig = np.zeros((tr, 1), np.int32)
    bsig = np.zeros((nb, 1), np.int32)
    c1 = rng.uniform(0.5, 1.0, tr).astype(np.float32)
    c2 = rng.uniform(0.5, 1.0, nb).astype(np.float32)
    args = dict(
        s64=s64, knn=knn, tc=256, exclude_self=True, masked=False,
        cutoff=0.64,
    )
    want_v, want_i = _knn_scan_block_comp(
        jnp.asarray(a_np), jnp.asarray(b_np), np.int32(0), np.int32(nb),
        sig, bsig, jnp.asarray(c1), jnp.asarray(c2), **args,
    )
    got_v, got_i = _knn_scan_block_comp_pallas(
        chunk_group_major(jnp.asarray(a_np), s64),
        jnp.transpose(chunk_group_major(jnp.asarray(b_np), s64)),
        np.int32(0), np.int32(nb),
        sig, bsig, jnp.asarray(c1), jnp.asarray(c2),
        ti=256, tj=256, interpret=True, **args,
    )
    assert np.array_equal(np.asarray(got_v), np.asarray(want_v))
    assert np.array_equal(np.asarray(got_i), np.asarray(want_i))


def test_samebits_pallas_chunked_rejects_ragged_tiles():
    s64 = 16
    a = jnp.zeros((100, (s64 // 4) * 128), jnp.uint32)
    bt = jnp.zeros(((s64 // 4) * 128, 256), jnp.uint32)
    with pytest.raises(ValueError, match="divisible"):
        samebits_pallas_chunked(a, bt, s64, ti=256, tj=256, interpret=True)
