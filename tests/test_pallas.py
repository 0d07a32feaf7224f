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


def test_knn_keys_pallas_interpret():
    """The fused keys kernel (samebits + validity/prefilter mask + packed
    key epilogue) must reproduce, in interpret mode, the exact packed keys
    the scan's XLA side builds from a raw samebits tile — unmasked and
    masked, across pad/diagonal boundaries and the masked block-skip."""
    import numpy as np
    import jax.numpy as jnp

    from sketchtpu.dist.jaccard_np import samebits_matrix
    from sketchtpu.dist.knn_jax import _pack_shift
    from sketchtpu.dist.pallas_kernels import (
        chunk_group_major,
        knn_keys_pallas,
    )

    rng = np.random.default_rng(5)
    s64 = 4
    w2 = s64 * 28
    na, nb = 16, 32
    nb_real = 27  # padded tail columns must come back -1
    row0, c0 = 8, 0  # rows [8, 24) -> diagonal crosses the tile
    a = rng.integers(0, 2**32, (na, w2), dtype=np.uint32)
    b = rng.integers(0, 2**32, (nb, w2), dtype=np.uint32)
    b[:na] = np.roll(a, 3, axis=0)  # some structure
    a_cm = chunk_group_major(jnp.asarray(a), s64)
    bt_cm = jnp.transpose(chunk_group_major(jnp.asarray(b), s64))

    sb = samebits_matrix(
        a.view(np.uint64), b.view(np.uint64)
    ).astype(np.int64)
    shift = _pack_shift(s64)
    colmask = (1 << shift) - 1
    cols = c0 + np.arange(nb)[None, :]
    rows = row0 + np.arange(na)[:, None]

    S = 7
    a_sig = rng.integers(0, 4, (na, S)).astype(np.int32)
    b_sig = rng.integers(0, 4, (nb, S)).astype(np.int32)
    # a whole (ti=8)-row block with NO candidates: flag == 0 skips the
    # samebits compute for all its (8, 8) blocks and the stale-acc guard
    # (valid all-False) must keep the output at -1
    a_sig[0:8] = 99
    shared = (a_sig[:, None, :] == b_sig[None, :, :]).any(axis=2)

    for masked in (False, True):
        valid = cols < nb_real
        valid = valid & (cols != rows)
        if masked:
            valid = valid & shared
        want = np.where(
            valid, (sb << shift) | (colmask - cols), -1
        ).astype(np.int32)
        got = np.asarray(
            knn_keys_pallas(
                a_cm,
                bt_cm,
                jnp.int32(c0),
                jnp.int32(row0),
                jnp.int32(nb_real),
                s64,
                shift,
                exclude_self=True,
                a_sig=jnp.asarray(a_sig) if masked else None,
                bsig_t=jnp.asarray(b_sig.T.copy()) if masked else None,
                masked=masked,
                ti=8,
                tj=8,
                interpret=True,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"masked={masked}")


def test_knn_keys_pallas_groupmax_interpret():
    """With gw > 1 the keys kernel must emit exactly the max packed key of
    each strided group (members B + i0 + ng*jj), including all-(-1)
    groups (pad/self)."""
    import numpy as np
    import jax.numpy as jnp

    from sketchtpu.dist.jaccard_np import samebits_matrix
    from sketchtpu.dist.knn_jax import _pack_shift
    from sketchtpu.dist.pallas_kernels import (
        chunk_group_major,
        knn_keys_pallas,
    )

    rng = np.random.default_rng(11)
    s64 = 4
    w2 = s64 * 28
    na, nb, nb_real = 16, 32, 29
    row0, c0 = 4, 64  # nonzero tile offset: global cols [64, 96)
    tj, gw = 8, 4
    ng = tj // gw
    a = rng.integers(0, 2**32, (na, w2), dtype=np.uint32)
    b = rng.integers(0, 2**32, (nb, w2), dtype=np.uint32)
    a_cm = chunk_group_major(jnp.asarray(a), s64)
    bt_cm = jnp.transpose(chunk_group_major(jnp.asarray(b), s64))

    sb = samebits_matrix(a.view(np.uint64), b.view(np.uint64)).astype(np.int64)
    shift = _pack_shift(s64)
    colmask = (1 << shift) - 1
    cols = c0 + np.arange(nb)[None, :]
    rows = row0 + np.arange(na)[:, None]
    valid = (cols < c0 + nb_real) & (cols != rows)
    keys = np.where(valid, (sb << shift) | (colmask - cols), -1).astype(np.int32)
    # strided groups within each tj block: member jj of group (blk, i0)
    # is local column blk*tj + i0 + ng*jj
    want = np.full((na, nb // gw), -1, np.int32)
    for blk in range(nb // tj):
        for i0 in range(ng):
            members = blk * tj + i0 + ng * np.arange(gw)
            want[:, blk * ng + i0] = keys[:, members].max(axis=1)
    got = np.asarray(
        knn_keys_pallas(
            a_cm, bt_cm, jnp.int32(c0), jnp.int32(row0),
            jnp.int32(c0 + nb_real), s64, shift, exclude_self=True,
            ti=8, tj=tj, interpret=True, gw=gw,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_knn_scan_block_gm_matches_v1():
    """The group-max scan (group maxes from the kernel epilogue + winning-
    member recompute) must return EXACTLY the v1 packed scan's selection —
    values, columns, and tie order — with self exclusion, padded columns,
    duplicate columns, and rows with fewer than knn candidates (dead
    group slots)."""
    import numpy as np
    import jax.numpy as jnp

    from sketchtpu.dist.knn_jax import (
        _knn_scan_block_gm,
        _knn_scan_block_packed,
    )
    from sketchtpu.dist.pallas_kernels import chunk_group_major

    rng = np.random.default_rng(9)
    s64 = 4
    w2 = s64 * 28
    tr, nbp, tc = 16, 64, 32
    row0 = 8
    a = rng.integers(0, 2**32, (tr, w2), dtype=np.uint32)
    b = rng.integers(0, 2**32, (nbp, w2), dtype=np.uint32)
    b[row0 : row0 + tr] = a  # self rows present -> exclusion matters
    b[40] = b[41]  # duplicate columns -> packed-key tie order must match
    a_cm = chunk_group_major(jnp.asarray(a), s64)
    b_cm = chunk_group_major(jnp.asarray(b), s64)
    bt_cm = jnp.transpose(b_cm)

    # (nb_real=57, knn=5): dense case; (nb_real=3, knn=5): every row has
    # fewer than knn candidates -> dead slots must come back as pad
    for nb_real, knn in ((57, 5), (3, 5), (57, 20)):
        v1, i1 = _knn_scan_block_packed(
            a_cm, bt_cm, jnp.int32(row0), jnp.int32(nb_real),
            s64, knn, tc, True, True,
            masked=False, ti=8, tj=8, interpret=True,
        )
        v2, i2 = _knn_scan_block_gm(
            a_cm, bt_cm, b_cm, jnp.int32(row0), jnp.int32(nb_real),
            s64, knn, tc, True,
            ti=8, tj=8, interpret=True, gw=4,
        )
        np.testing.assert_array_equal(
            np.asarray(v2), np.asarray(v1),
            err_msg=f"vals nb_real={nb_real} knn={knn}",
        )
        np.testing.assert_array_equal(
            np.asarray(i2), np.asarray(i1),
            err_msg=f"idx nb_real={nb_real} knn={knn}",
        )
