"""Native C++ fastx parser parity vs the Python parser (byte-exact streams)."""

import numpy as np
import pytest

import sketchtpu.ingest.fastx as fx
from sketchtpu._native import get_lib

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _python_parse(files, min_qual):
    native = fx._parse_dna_native
    fx._parse_dna_native = lambda *a, **k: None
    try:
        return fx.read_dna_sample(files, min_qual)
    finally:
        fx._parse_dna_native = native


@needs_native
@pytest.mark.parametrize(
    "names,minq",
    [
        (["R6.fa.gz"], 0),
        (["TIGR4.fa.gz"], 0),
        (["14412_3#82.contigs_velvet.fa.gz"], 0),
        (["short_sequence.fa"], 0),
        (["test_1_fwd.fastq.gz", "test_1_rev.fastq.gz"], 20),
        (["test_2_fwd.fastq.gz", "test_2_rev.fastq.gz"], 5),
        (["test_1_fwd.fastq.gz"], 0),
    ],
)
def test_native_parse_matches_python(ref_in, names, minq):
    files = [str(ref_in / n) for n in names]
    want = _python_parse(files, minq)
    got = fx.read_dna_sample(files, minq)
    np.testing.assert_array_equal(got.codes, want.codes)
    np.testing.assert_array_equal(got.breaks, want.breaks)
    np.testing.assert_array_equal(got.acgt, want.acgt)
    assert got.non_acgt == want.non_acgt
    assert got.reads == want.reads


@needs_native
def test_native_parse_edge_cases(tmp_path):
    """Blank lines, Ns, lowercase, empty records, CRLF, multi-record."""
    fa = tmp_path / "x.fa"
    fa.write_bytes(
        b">r1\r\nACGTNNacgt\r\n\r\nTTT\r\n>empty\r\n>r3\nNNN\nGG  CC\n"
    )
    want = _python_parse([str(fa)], 0)
    got = fx.read_dna_sample([str(fa)], 0)
    np.testing.assert_array_equal(got.codes, want.codes)
    np.testing.assert_array_equal(got.breaks, want.breaks)
    np.testing.assert_array_equal(got.acgt, want.acgt)
    assert got.non_acgt == want.non_acgt

    fq = tmp_path / "y.fastq"
    fq.write_bytes(
        b"@a\nACGTN\n+\nIIII!\n\n@b\nacg\n+xx\n!!I\n"
    )
    want = _python_parse([str(fq)], 20)
    got = fx.read_dna_sample([str(fq)], 20)
    np.testing.assert_array_equal(got.codes, want.codes)
    np.testing.assert_array_equal(got.breaks, want.breaks)
    assert got.non_acgt == want.non_acgt


@needs_native
def test_native_parse_malformed_falls_back(tmp_path):
    fq = tmp_path / "bad.fastq"
    fq.write_bytes(b"@a\nACGT\nNOPLUS\nIIII\n")
    with pytest.raises(ValueError, match="Invalid FASTQ record"):
        fx.read_dna_sample([str(fq)], 0)


@needs_native
@pytest.mark.parametrize("concat", [False, True])
def test_native_aa_parse_matches_python(ref_in, concat):
    files = [str(ref_in / "test_aa_sequence.fa")]
    native = fx._parse_aa_native
    fx._parse_aa_native = lambda *a, **k: None
    try:
        want = fx.read_aa_sample(files, concat)
    finally:
        fx._parse_aa_native = native
    got = fx.read_aa_sample(files, concat)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.seq, w.seq)
        assert g.invalid_count == w.invalid_count


@needs_native
@pytest.mark.parametrize("concat", [False, True])
def test_native_aa_parse_edge_cases(tmp_path, concat):
    fa = tmp_path / "p.fa"
    fa.write_bytes(
        b">a\r\nACDE fgXz\r\n\r\nKLM\r\n>empty\r\n>c\nwy*12\n"
    )
    files = [str(fa)]
    native = fx._parse_aa_native
    fx._parse_aa_native = lambda *a, **k: None
    try:
        want = fx.read_aa_sample(files, concat)
    finally:
        fx._parse_aa_native = native
    got = fx.read_aa_sample(files, concat)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.seq, w.seq)
        assert g.invalid_count == w.invalid_count
