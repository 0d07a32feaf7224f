"""Golden distance tests: output must be string-identical to the reference's
committed stdout snapshots (tests/test_results_correct)."""

import io

import numpy as np
import pytest

from sketchtpu.dist import api, output
from sketchtpu.formats.skm import MultiSketch
from sketchtpu.ingest.fastx import read_dna_sample
from sketchtpu.sketchcore.sketch import HashType, sketch_dna_sample

NAMES = [
    "14412_3#82.contigs_velvet.fa.gz",
    "14412_3#84.contigs_velvet.fa.gz",
    "R6.fa.gz",
    "TIGR4.fa.gz",
]
KMERS = [17, 21, 25, 29]  # --k-seq 17,31,4
SKETCH_BINS = 10048  # -s 10000 rounded up to a multiple of 64


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    from conftest import REF_IN

    if not REF_IN.is_dir():
        pytest.skip("reference fixtures not available")
    sketches = []
    for i, name in enumerate(NAMES):
        stream = read_dna_sample([str(REF_IN / name)])
        sk = sketch_dna_sample(stream, name, KMERS, SKETCH_BINS, True, 0)
        sk.index = i
        sketches.append(sk)
    ms = MultiSketch(sketches, SKETCH_BINS, KMERS, HashType("dna"))
    ms.sketch_bins = np.concatenate([sk.usigs for sk in sketches])
    # also write the skd so subset block loading can be exercised
    out = tmp_path_factory.mktemp("db")
    from sketchtpu.formats import skd

    with skd.SketchDataWriter(str(out / "db.skd")) as w:
        for sk in sketches:
            w.write_sketch(sk.usigs)
    ms.save_metadata(str(out / "db"))
    return ms, str(out / "db")


def _golden(name):
    from conftest import REF_CORRECT

    return (REF_CORRECT / name).read_text()


def test_knn_coreacc(db):
    ms, _ = db
    rows = api.self_dists_knn(ms, 1, api.set_k(ms, None, False))
    buf = io.StringIO()
    output.write_sparse(buf, NAMES, NAMES, rows, coreacc=True)
    assert buf.getvalue() == _golden("dists_knn_ca.stdout")


def test_knn_jaccard(db):
    ms, _ = db
    rows = api.self_dists_knn(ms, 1, api.set_k(ms, 21, False))
    buf = io.StringIO()
    output.write_sparse(buf, NAMES, NAMES, rows, coreacc=False)
    assert buf.getvalue() == _golden("dists_knn_jaccard.stdout")


def test_knn_ani(db):
    ms, _ = db
    rows = api.self_dists_knn(ms, 1, api.set_k(ms, 21, True))
    buf = io.StringIO()
    output.write_sparse(buf, NAMES, NAMES, rows, coreacc=False)
    assert buf.getvalue() == _golden("dists_knn_ani.stdout")


def test_subset_dense_coreacc(db):
    _, prefix = db
    ms = MultiSketch.load_metadata(prefix)
    ms.read_sketch_data_block(
        prefix, ["R6.fa.gz", "TIGR4.fa.gz", "14412_3#84.contigs_velvet.fa.gz"]
    )
    d = api.self_dists_all(ms, api.set_k(ms, None, False))
    names = [ms.sketch_name(i) for i in range(ms.number_samples_loaded())]
    buf = io.StringIO()
    output.write_dense_self(buf, names, d, coreacc=True)
    assert buf.getvalue() == _golden("dists_subset.stdout")


def _truth_dict():
    truth = {}
    for line in _golden("sketchlib_output_true.txt").splitlines():
        key, _, val = line.partition(": ")
        if val.startswith("["):
            truth[key] = [float(x) for x in val.strip("[]").split(",")]
        elif val:
            truth[key] = [float(val)]
    return truth


def test_dense_vs_pp_sketchlib_truth():
    """Dense Jaccard distances at k=31, s=10000 vs the C++ pp-sketchlib truth
    values, tolerance 0.05 (the reference's own accuracy gate,
    tests/distance.rs:16-30, 163-266)."""
    from conftest import REF_IN

    if not REF_IN.is_dir():
        pytest.skip("reference fixtures not available")
    truth = _truth_dict()
    sketches = []
    for i, name in enumerate(NAMES):
        stream = read_dna_sample([str(REF_IN / name)])
        sk = sketch_dna_sample(stream, name, [31], SKETCH_BINS, True, 0)
        sk.index = i
        sketches.append(sk)
    ms = MultiSketch(sketches, SKETCH_BINS, [31], HashType("dna"))
    ms.sketch_bins = np.concatenate([sk.usigs for sk in sketches])
    d = api.self_dists_all(ms, api.set_k(ms, 31, False))
    expected = truth["multiple_genomes"]
    assert len(expected) == d.shape[0]
    for got, want in zip(d, expected):
        assert abs(round(float(got), 3) - round(want, 3)) <= 0.05


def test_knn_equals_dense_topk(db):
    ms, _ = db
    dt = api.set_k(ms, 21, False)
    dense = api.self_dists_all(ms, dt)
    rows = api.self_dists_knn(ms, 3, dt)
    n = len(NAMES)
    full = np.ones((n, n), dtype=np.float32)
    idx = 0
    for i in range(n):
        for j in range(i + 1, n):
            full[i, j] = full[j, i] = dense[idx]
            idx += 1
    for i, items in enumerate(rows):
        got = sorted(d for _, d in items)
        want = sorted(np.delete(full[i], i))[:3]
        assert np.allclose(got, want)
