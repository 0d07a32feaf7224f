"""Native .ski index codec parity: the C++ writer must emit byte-identical
payloads to the Python msgpack+roaring encoders, and the C++ reader must
reconstruct the exact sign matrix (with Python fallback preserved)."""

import numpy as np
import pytest

from sketchtpu._native import get_lib
from sketchtpu.inverted.index import Inverted
from sketchtpu.formats import msgpack, snappy
from sketchtpu.sketchcore.sketch import HashType

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _inv(n, s, seed=0, sign_range=60000):
    rng = np.random.default_rng(seed)
    mat = rng.integers(0, sign_range, (n, s)).astype(np.uint16)
    return Inverted(
        sign_matrix=mat,
        sample_names=[f"g{i}" for i in range(n)],
        kmer_size=21,
        rc=True,
        hash_type=HashType("dna"),
        metadata=["m"] * n,
        labels=None,
    )


@needs_native
@pytest.mark.parametrize(
    "n,s,sign_range",
    [
        (37, 11, 60000),   # tiny: fixmap bins, fixint/u8/u16 keys
        (300, 7, 5),       # few signs, many members (array containers)
        (70001, 3, 2),     # >65536 members per sign: bitset + two containers
        (900, 40, 200),
    ],
)
def test_native_ski_payload_byte_identical(n, s, sign_range):
    inv = _inv(n, s, seed=n, sign_range=sign_range)
    raw = inv._index_raw()
    assert raw is not None
    fallback = [
        {sign: __import__("sketchtpu.formats.roaring", fromlist=["x"]).serialize(m)
         for sign, m in bin_map.items()}
        for bin_map in inv._index_maps()
    ]
    assert raw.data == msgpack.dumps(fallback)


@needs_native
def test_native_ski_roundtrip_and_python_cross(tmp_path):
    inv = _inv(5000, 20, seed=1)
    inv.save(str(tmp_path / "a"))
    back = Inverted.load(str(tmp_path / "a"))
    np.testing.assert_array_equal(back.sign_matrix, inv.sign_matrix)
    assert back.sample_names == inv.sample_names
    assert back.metadata == inv.metadata

    # python reader on native-written file
    import sketchtpu.inverted.index as idx

    orig = idx.Inverted._load_index_native
    idx.Inverted._load_index_native = classmethod(lambda cls, p: None)
    try:
        back_py = Inverted.load(str(tmp_path / "a"))
    finally:
        idx.Inverted._load_index_native = orig
    np.testing.assert_array_equal(back_py.sign_matrix, inv.sign_matrix)

    # native reader on python-written file
    raw_fast = idx.Inverted._index_raw
    idx.Inverted._index_raw = lambda self: None
    try:
        inv.save(str(tmp_path / "b"))
    finally:
        idx.Inverted._index_raw = raw_fast
    back2 = Inverted.load(str(tmp_path / "b"))
    np.testing.assert_array_equal(back2.sign_matrix, inv.sign_matrix)
    assert (tmp_path / "a.ski").read_bytes() == (tmp_path / "b.ski").read_bytes()
