"""Golden tests: sketching the reference's fixture genomes must reproduce its
committed sketch databases bit-for-bit."""

import numpy as np
import pytest

from sketchtpu.formats import skd
from sketchtpu.ingest.fastx import read_dna_sample
from sketchtpu.sketchcore.sketch import sketch_dna_sample

GENOMES = [
    "14412_3#82.contigs_velvet.fa.gz",
    "14412_3#84.contigs_velvet.fa.gz",
    "R6.fa.gz",
    "TIGR4.fa.gz",
]


@pytest.fixture(scope="module")
def streams(request):
    ref_in = request.getfixturevalue("ref_in_module")
    return {g: read_dna_sample([str(ref_in / g)]) for g in GENOMES}


@pytest.fixture(scope="module")
def ref_in_module():
    from conftest import REF_IN

    if not REF_IN.is_dir():
        pytest.skip("reference fixtures not available")
    return REF_IN


def test_skd_bit_exact(streams, ref_in_module):
    usigs = [
        sketch_dna_sample(streams[g], g, [31], 1024, rc=True, min_count=0).usigs
        for g in GENOMES
    ]
    mine = np.concatenate(usigs)
    ref = skd.read_all_skd(str(ref_in_module / "sketches1.skd"))
    assert np.array_equal(mine, ref)


def test_metadata_matches_reference_skm(streams, ref_in_module):
    from sketchtpu.formats.skm import MultiSketch

    ref = MultiSketch.load_metadata(str(ref_in_module / "sketches1"))
    for i, g in enumerate(GENOMES):
        sk = sketch_dna_sample(streams[g], g, [31], 1024, rc=True, min_count=0)
        ref_meta = ref.sketch_metadata[i]
        assert sk.name == ref_meta.name
        assert sk.seq_length == ref_meta.seq_length
        assert tuple(sk.acgt) == tuple(ref_meta.acgt)
        assert sk.non_acgt == ref_meta.non_acgt
        assert sk.reads == ref_meta.reads
        assert sk.densified == ref_meta.densified
        assert sk.rc == ref_meta.rc


def test_chunked_pipeline_bit_exact(ref_in_module, tmp_path, monkeypatch):
    """The device pipeline's chunked parse-ahead (pipeline._chunk_inputs)
    must write the same .skd/metadata as a single chunk."""
    from sketchtpu.sketchcore import pipeline
    from sketchtpu.sketchcore.pipeline import sketch_files
    from sketchtpu.sketchcore.sketch import HashType
    from sketchtpu.sketchcore.sketch_jax import DeviceSketchBackend

    inputs = [(g, [str(ref_in_module / g)]) for g in GENOMES]
    backend = DeviceSketchBackend()

    def run(prefix):
        return sketch_files(
            str(tmp_path / prefix),
            inputs,
            concat_fasta=False,
            kmers=[17],
            sketch_bins=128,
            seq_type=HashType("dna"),
            rc=True,
            min_count=0,
            min_qual=0,
            backend=backend,
        )

    one = run("one")
    monkeypatch.setattr(pipeline, "_CHUNK_SAMPLES", 1)
    many = run("many")
    assert (tmp_path / "one.skd").read_bytes() == (tmp_path / "many.skd").read_bytes()
    assert [s.name for s in one] == [s.name for s in many]
    assert [s.index for s in one] == [s.index for s in many]
    assert [s.seq_length for s in one] == [s.seq_length for s in many]


def test_skm_writer_byte_parity(streams, ref_in_module, tmp_path):
    """A repo-WRITTEN .skm must byte-match the reference-written fixture
    (multisketch.rs:80-103): same CBOR field order and encodings, same
    snappy frames. The only nondeterminism in the reference's output is
    `name_map` iteration order (a Rust HashMap randomizes per process), so
    the test pins our map to the fixture's observed order and the version
    field to the fixture's "0.2.0" — every other byte is produced by our
    own sketcher + codecs."""
    from sketchtpu._native import get_lib
    from sketchtpu.formats import cbor, snappy
    from sketchtpu.formats.skm import MultiSketch
    from sketchtpu.sketchcore.sketch import HashType

    if get_lib() is None:
        pytest.skip("native snappy unavailable (pure-Python is all-literal)")
    fixture = (ref_in_module / "sketches1.skm").read_bytes()
    fix_map_order = list(
        cbor.loads(snappy.frame_decompress(fixture))["name_map"]
    )
    sketches = []
    for i, g in enumerate(GENOMES):
        sk = sketch_dna_sample(streams[g], g, [31], 1024, rc=True, min_count=0)
        sk.index = i
        sketches.append(sk)
    ms = MultiSketch(
        sketches, 1024, [31], HashType("dna"), sketch_version="0.2.0"
    )
    ms.name_map = {name: ms.name_map[name] for name in fix_map_order}
    ms.save_metadata(str(tmp_path / "mine"))
    assert (tmp_path / "mine.skm").read_bytes() == fixture
