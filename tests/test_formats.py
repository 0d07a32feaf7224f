"""Codec round-trips and compatibility with reference-produced files."""

import numpy as np
import pytest

from sketchtpu.formats import cbor, snappy, skd
from sketchtpu.formats.skm import MultiSketch


def test_cbor_roundtrip():
    obj = {
        "a": 1,
        "b": [0, 23, 24, 255, 256, 65535, 65536, 2**32, 2**63, -1, -25],
        "c": "héllo",
        "d": None,
        "e": True,
        "f": {"nested": [1.5, False]},
        "g": b"\x00\x01\xff",
    }
    assert cbor.loads(cbor.dumps(obj)) == obj


def test_snappy_raw_roundtrip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 10, 100, 70000]:
        # compressible data (repeats) and random data
        data1 = bytes(rng.integers(0, 4, n, dtype=np.uint8)) * 3
        data2 = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for data in (data1, data2):
            assert snappy.decompress_raw(snappy.compress_raw(data)) == data


def test_snappy_frame_roundtrip():
    rng = np.random.default_rng(1)
    for n in [0, 5, 65536, 200001]:
        data = bytes(rng.integers(0, 16, n, dtype=np.uint8))
        out = snappy.frame_decompress(
            snappy.frame_compress(data), verify_checksums=True
        )
        assert out == data


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 zero bytes
    assert snappy.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert snappy.crc32c(b"\xff" * 32) == 0x62A8AB43
    assert snappy.crc32c(bytes(range(32))) == 0x46DD794E


def test_load_reference_skm(ref_in):
    ms = MultiSketch.load_metadata(str(ref_in / "sketches1"))
    assert ms.sketch_size == 1024
    assert ms.sketchsize64 == 16
    assert ms.kmer_lengths == [31]
    assert len(ms.sketch_metadata) == 4
    assert ms.hash_type.kind == "dna"
    assert ms.sketch_metadata[0].name == "14412_3#82.contigs_velvet.fa.gz"
    assert ms.sketch_metadata[0].seq_length == 1832266


def test_load_legacy_skm(ref_in):
    # pre-v0.2.0 file: sketchsize64 stored in sketch_size
    ms = MultiSketch.load_metadata(str(ref_in / "legacy_db"))
    assert ms.sketch_size == ms.sketchsize64 * 64


def test_skm_roundtrip(tmp_path, ref_in):
    ms = MultiSketch.load_metadata(str(ref_in / "sketches1"))
    ms.save_metadata(str(tmp_path / "rt"))
    ms2 = MultiSketch.load_metadata(str(tmp_path / "rt"))
    assert ms2.sketch_size == ms.sketch_size
    assert ms2.kmer_lengths == ms.kmer_lengths
    assert ms2.name_map == ms.name_map
    assert [s.to_serde() for s in ms2.sketch_metadata] == [
        s.to_serde() for s in ms.sketch_metadata
    ]


def test_skd_read_batch(tmp_path):
    data = np.arange(40, dtype=np.uint64)
    path = str(tmp_path / "t.skd")
    with skd.SketchDataWriter(path) as w:
        for i in range(4):
            assert w.write_sketch(data[i * 10 : (i + 1) * 10]) == i
    full = skd.read_all_skd(path)
    assert np.array_equal(full, data)
    batch = skd.read_skd_batch(path, [2, 0], 10)
    assert np.array_equal(batch[:10], data[20:30])
    assert np.array_equal(batch[10:], data[0:10])


def test_species_file_validation(tmp_path):
    """Tab-less lines error clearly; a repeated sample row keeps its first
    label instead of claiming two output indices (the reference's version
    collides an unlabeled sample with a labeled one, io.rs:95-105)."""
    import pytest

    from sketchtpu.ingest.inputs import parse_metadata_info, reorder_input_files

    inputs = [("A", ["a.fa"]), ("B", ["b.fa"]), ("C", ["c.fa"])]
    bad = tmp_path / "bad.txt"
    bad.write_text("A\tlab1\nno-tab-line\n")
    with pytest.raises(ValueError, match="expected"):
        reorder_input_files(inputs, str(bad))

    dup = tmp_path / "dup.txt"
    dup.write_text("A\tlab1\nA\tlab1\nB\tlab2\n")
    order, labels = reorder_input_files(inputs, str(dup))
    # dense, collision-free indices: A,B labeled; C appended after
    assert sorted(order) == [0, 1, 2]
    assert labels == {"A": "lab1", "B": "lab2"}

    meta_bad = tmp_path / "meta.txt"
    meta_bad.write_text("A\n")
    with pytest.raises(ValueError, match="expected"):
        parse_metadata_info(str(meta_bad))


def test_snappy_checksum_verified(tmp_path):
    """Corrupted framed streams fail with a checksum error on load (the
    reference's snap::FrameDecoder behavior), not a decode error."""
    import pytest

    from sketchtpu.formats import snappy

    import numpy as np

    # incompressible payload -> stored as an UNCOMPRESSED chunk, so the
    # flipped byte reaches the CRC check rather than the decompressor
    data = np.random.default_rng(0).integers(0, 256, 500, dtype=np.uint8)
    framed = bytearray(snappy.frame_compress(data.tobytes()))
    framed[-1] ^= 0xFF  # flip a payload byte, CRC now mismatches
    with pytest.raises(ValueError, match="checksum"):
        snappy.frame_decompress(bytes(framed))


def test_snappy_recompress_byte_parity(ref_in):
    """Our snappy compressor re-implements the classic block algorithm the
    reference's `snap` crate uses (64 KiB blocks, sized hash table, skip/32
    accelerator, 68/64 copy split), so recompressing a reference-written
    container must reproduce its bytes exactly — the strongest executable
    load-compat proof available without a Rust toolchain."""
    from sketchtpu._native import get_lib

    if get_lib() is None:
        pytest.skip("native snappy unavailable (pure-Python is all-literal)")
    for name in ["sketches1.skm", "sketches2.skm", "sketches3.skm",
                 "legacy_db.skm"]:
        raw = (ref_in / name).read_bytes()
        payload = snappy.frame_decompress(raw)
        assert snappy.frame_compress(payload) == raw, name


def test_cbor_reencode_identity(ref_in):
    """Decoding a ciborium-written payload and re-encoding it with our CBOR
    writer must reproduce the payload byte-for-byte (field order, minimal
    integer widths, string/array/map headers)."""
    for name in ["sketches1.skm", "legacy_db.skm"]:
        payload = snappy.frame_decompress((ref_in / name).read_bytes())
        assert cbor.dumps(cbor.loads(payload)) == payload, name
