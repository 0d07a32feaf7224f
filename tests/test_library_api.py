"""Public library surface (`import sketchtpu`): the reference is a Rust
library as well as a CLI (docs.rs API, src/lib.rs:19-129), so the package
root re-exports the equivalent Python API."""

import numpy as np

import sketchtpu as st

from conftest import REF_IN


def test_sketch_load_dist_roundtrip(tmp_path):
    inputs = st.get_input_list(
        None,
        [
            str(REF_IN / "R6.fa.gz"),
            str(REF_IN / "TIGR4.fa.gz"),
        ],
    )
    prefix = str(tmp_path / "db")
    ms = st.sketch_database(prefix, inputs, kmers=[17, 21], sketch_size=100)
    assert (tmp_path / "db.skd").exists() and (tmp_path / "db.skm").exists()
    assert ms.number_samples_loaded() == 2

    loaded = st.load_database(prefix)
    dt = st.set_k(loaded, 17, False)
    d = st.self_dists_all(loaded, dt)
    assert d.shape == (1,)
    assert 0.0 <= float(d[0]) <= 1.0

    # multi-k core/accessory
    dt_ca = st.set_k(loaded, None, False)
    ca = st.self_dists_all(loaded, dt_ca)
    assert ca.shape == (1, 2)

    # kNN returns one row per sample
    rows = st.self_dists_knn(loaded, 1, dt)
    assert len(rows) == 2

    # subset load by name
    sub = st.load_database(prefix, subset=[loaded.sketch_name(0)])
    assert sub.number_samples_loaded() == 1


def test_all_exports_resolve():
    for name in st.__all__:
        assert getattr(st, name, None) is not None, name
