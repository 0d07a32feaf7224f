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


@needs_native
def test_parallel_single_file_parse_identical(tmp_path):
    """threads>1 splits a large FASTA into record-aligned ranges parsed
    concurrently; codes/breaks/acgt/non_acgt must equal the whole-file
    parse exactly (incl. N-break positions and end-of-record breaks)."""
    rng = np.random.default_rng(11)
    al = np.frombuffer(b"ACGTN", dtype=np.uint8)
    parts = [b">r0"]
    for i in range(37):
        # ragged record and line lengths; ~1% N
        seq = al[rng.choice(5, int(rng.integers(50_000, 400_000)),
                            p=[0.2475] * 4 + [0.01])]
        w = int(rng.integers(40, 120))
        lines = [seq[j:j + w].tobytes() for j in range(0, seq.size, w)]
        parts.append(b"\n".join(lines))
        parts.append(f">r{i + 1}".encode())
    fa = tmp_path / "big.fa"
    fa.write_bytes(b"\n".join(parts[:-1]) + b"\n")
    assert fa.stat().st_size > fx._PAR_MIN_BYTES

    one = fx._parse_dna_native(str(fa), 0, threads=1)
    par = fx._parse_dna_native(str(fa), 0, threads=5)
    assert one is not None and par is not None
    np.testing.assert_array_equal(one[0], par[0])
    np.testing.assert_array_equal(one[1], par[1])
    np.testing.assert_array_equal(one[2], par[2])
    assert one[3] == par[3]

    # range invariants: full cover, every later range starts at '>'
    raw = fa.read_bytes()
    ranges = fx._fasta_ranges(raw, 5)
    assert ranges[0][0] == 0 and ranges[-1][1] == len(raw)
    for (s0, e0), (s1, _) in zip(ranges, ranges[1:]):
        assert e0 == s1 and raw[s1:s1 + 1] == b">"
