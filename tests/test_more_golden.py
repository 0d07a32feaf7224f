"""Additional reference-parity tests: legacy databases, completeness
correction, cross-query kNN behaviours, short-sequence truth values.

Ports the behaviours of the reference's tests/{sketch,completeness,
distance}.rs that are not already covered by the stdout-golden tests.
"""

import io

import numpy as np
import pytest

from sketchtpu.dist import api, output
from sketchtpu.dist.jaccard_np import jaccard_from_samebits, samebits_matrix
from sketchtpu.formats import skd
from sketchtpu.formats.skm import MultiSketch
from sketchtpu.ingest.fastx import read_dna_sample
from sketchtpu.ingest.inputs import read_completeness_file
from sketchtpu.sketchcore.sketch import HashType, sketch_dna_sample

PAIR = ["14412_3#82.contigs_velvet.fa.gz", "14412_3#84.contigs_velvet.fa.gz"]


def _build_db(ref_in, names, kmers, bins):
    sketches = []
    for i, name in enumerate(names):
        stream = read_dna_sample([str(ref_in / name)])
        sk = sketch_dna_sample(stream, name, kmers, bins, True, 0)
        sk.index = i
        sketches.append(sk)
    ms = MultiSketch(sketches, bins, kmers, HashType("dna"))
    ms.sketch_bins = np.concatenate([s.usigs for s in sketches])
    return ms


def test_legacy_database_bit_exact(ref_in):
    """Pre-v0.2.0 databases (v0.1.3 writer) load via the back-compat shim
    and are reproduced bit-exactly by fresh sketching (tests/sketch.rs:
    legacy_databases, which documents the original command)."""
    legacy = MultiSketch.load_metadata(str(ref_in / "legacy_db"))
    assert legacy.sketch_size == 128 and legacy.sketchsize64 == 2
    assert legacy.kmer_lengths == [17, 21, 25]
    mine = _build_db(ref_in, ["R6.fa.gz", "TIGR4.fa.gz"], [17, 21, 25], 128)
    ref_bins = skd.read_all_skd(str(ref_in / "legacy_db.skd"))
    assert np.array_equal(mine.sketch_bins, ref_bins)
    for sk, ref in zip(mine.sketch_metadata, legacy.sketch_metadata):
        assert sk.name == ref.name
        assert sk.seq_length == ref.seq_length
        assert tuple(sk.acgt) == tuple(ref.acgt)


@pytest.fixture(scope="module")
def pair_db(request):
    from conftest import REF_IN

    if not REF_IN.is_dir():
        pytest.skip("reference fixtures not available")
    return _build_db(REF_IN, PAIR, [31], 1024)


def test_completeness_correction_formula_exact(pair_db, tmp_path):
    """corrected J = J / (c1*c2/(c1+c2-c1*c2)) when c1*c2 >= cutoff
    (tests/completeness.rs:468+)."""
    ms = pair_db
    c1, c2 = 0.8, 0.9
    dt = api.set_k(ms, 31, False)
    d_unc = api.self_dists_all(ms, dt)
    d_cor = api.self_dists_all(ms, dt, completeness_vec=[c1, c2])
    j_unc = 1.0 - float(d_unc[0])
    j_cor = 1.0 - float(d_cor[0])
    expected = j_unc / (c1 * c2 / (c1 + c2 - c1 * c2))
    assert abs(j_cor - min(expected, 1.0)) < 1e-6
    # below the cutoff no correction is applied
    d_low = api.self_dists_all(ms, dt, completeness_vec=[0.5, 0.9])
    assert float(d_low[0]) == float(d_unc[0])


def test_completeness_file_parsing(pair_db, tmp_path):
    ms = pair_db
    f = tmp_path / "comp.txt"
    f.write_text(f"{PAIR[0]}\t0.8\n{PAIR[1]}\t0.9\nunknown_genome\t0.5\n")
    vec = read_completeness_file(str(f), ms)
    assert vec == [0.8, 0.9]
    # missing genomes default to 1.0
    f2 = tmp_path / "comp2.txt"
    f2.write_text(f"{PAIR[0]}\t0.8\n")
    assert read_completeness_file(str(f2), ms) == [0.8, 1.0]
    # percentages rejected with offender list
    f3 = tmp_path / "comp3.txt"
    f3.write_text(f"{PAIR[0]}\t80\n")
    with pytest.raises(ValueError, match="not percentages"):
        read_completeness_file(str(f3), ms)


def test_completeness_ordering_invariance(pair_db):
    """Correction must be symmetric in (c1, c2) (tests/completeness.rs:19)."""
    ms = pair_db
    dt = api.set_k(ms, 31, False)
    d1 = api.self_dists_all(ms, dt, completeness_vec=[0.8, 0.9])
    d2 = api.self_dists_all(ms, dt, completeness_vec=[0.9, 0.8])
    assert np.array_equal(d1, d2)


@pytest.fixture(scope="module")
def quad_db():
    from conftest import REF_IN

    if not REF_IN.is_dir():
        pytest.skip("reference fixtures not available")
    names = PAIR + ["R6.fa.gz", "TIGR4.fa.gz"]
    return _build_db(REF_IN, names, [21], 1024)


def test_cross_knn_behaviours(quad_db, ref_in):
    """Cross-query kNN: row counts, knn=n edge, consistency with dense
    (tests/distance.rs:388-687)."""
    refs = _build_db(ref_in, ["R6.fa.gz", "TIGR4.fa.gz"], [21], 1024)
    queries = _build_db(ref_in, PAIR, [21], 1024)
    dt = api.set_k(refs, 21, False)
    rows = api.cross_dists_knn(refs, queries, 1, dt)
    assert len(rows) == 2 and all(len(r) == 1 for r in rows)
    # knn > n clamps to n (queries never overlap refs in cross mode)
    rows_all = api.cross_dists_knn(refs, queries, 10, dt)
    assert all(len(r) == 2 for r in rows_all)
    # consistency with dense rectangle
    dense = api.cross_dists_all(refs, queries, dt).reshape(2, 2)
    for qi, row in enumerate(rows_all):
        got = sorted(d for _, d in row)
        want = sorted(dense[:, qi])
        assert np.allclose(got, want)


def test_self_knn_row_name_orientation(quad_db):
    """Self kNN output rows are reference names in order; neighbour column
    indexes the same name list."""
    dt = api.set_k(quad_db, 21, False)
    rows = api.self_dists_knn(quad_db, 2, dt)
    names = [s.name for s in quad_db.sketch_metadata]
    buf = io.StringIO()
    output.write_sparse(buf, names, names, rows, coreacc=False)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 8
    assert lines[0].split("\t")[0] == names[0]


def test_short_sequence_truth_values(ref_in, ref_correct):
    """Jaccard distance at k=3/5 of the 1-SNP short sequences vs the C++
    pp-sketchlib truth values (tests/distance.rs tests 1-2)."""
    truth = {}
    for line in (ref_correct / "sketchlib_output_true.txt").read_text().splitlines():
        key, _, val = line.partition(": ")
        if val and not val.startswith("["):
            truth[key] = float(val)

    for k, key in [(3, "short_sequence_jaccard_dists_3")]:
        a = _build_db(ref_in, ["short_sequence.fa"], [k], 1024)
        b = _build_db(ref_in, ["short_sequence_SNP.fa"], [k], 1024)
        d = api.cross_dists_all(a, b, api.set_k(a, k, False))
        assert abs(round(float(d[0]), 3) - round(truth[key], 3)) <= 0.05

    # whole genome vs block-removed at k=17
    a = _build_db(ref_in, [PAIR[0]], [17], 1024)
    b = _build_db(
        ref_in, ["14412_3#82.contigs_velvet_removed_block.fa.gz"], [17], 1024
    )
    d = api.cross_dists_all(a, b, api.set_k(a, 17, False))
    assert (
        abs(round(float(d[0]), 3) - round(truth["whole_genome_block_removed"], 3))
        <= 0.05
    )
