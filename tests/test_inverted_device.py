"""Parity: device inverted-index kernels vs the host (NumPy) oracle."""

import numpy as np

from sketchtpu.inverted.device import DeviceInvertedEngine
from sketchtpu.inverted.index import Inverted
from sketchtpu.sketchcore.sketch import HashType


def _random_index(n=700, s=129, seed=0):
    rng = np.random.default_rng(seed)
    # small sign alphabet so shared bins are common; a few u16::MAX empties
    mat = rng.integers(0, 40, (n, s), dtype=np.uint16)
    mat[rng.random((n, s)) < 0.01] = np.uint16(0xFFFF)
    return Inverted(
        sign_matrix=mat,
        sample_names=[f"s{i}" for i in range(n)],
        kmer_size=17,
        rc=True,
        hash_type=HashType("dna"),
    )


def test_any_shared_bin_count_matches_host():
    inv = _random_index()
    engine = DeviceInvertedEngine(inv.sign_matrix, tile=256)
    assert engine.any_shared_bin_count() == inv.any_shared_bin_count()


def test_any_shared_bin_count_tiny_tile_and_sparse_matches():
    rng = np.random.default_rng(3)
    # sparse matches: large alphabet
    mat = rng.integers(0, 60000, (130, 64), dtype=np.uint16)
    mat[5] = mat[99]  # guarantee at least one pair
    inv = Inverted(
        sign_matrix=mat,
        sample_names=[f"s{i}" for i in range(mat.shape[0])],
        kmer_size=17,
        rc=True,
        hash_type=HashType("dna"),
    )
    engine = DeviceInvertedEngine(mat, tile=64)
    assert engine.any_shared_bin_count() == inv.any_shared_bin_count()


def test_match_counts_and_any_all_rows_match_host():
    inv = _random_index(n=300, s=65, seed=1)
    rng = np.random.default_rng(2)
    queries = rng.integers(0, 40, (9, 65), dtype=np.uint16)
    # rows 7/8 duplicate index rows so all-bins has real hits (row 77 twice
    # in the matrix catches the multi-hit path)
    queries[7] = inv.sign_matrix[77]
    queries[8] = inv.sign_matrix[3]
    inv.sign_matrix[212] = inv.sign_matrix[77]
    engine = DeviceInvertedEngine(inv.sign_matrix, tile=128)

    counts = engine.match_counts(queries)
    anyrows = engine.any_shared_rows(queries)
    allrows = engine.all_shared_rows(queries)
    assert allrows[7].sum() >= 2 and allrows[8].sum() >= 1
    for qi in range(queries.shape[0]):
        np.testing.assert_array_equal(
            counts[qi], inv.query_match_count(queries[qi])
        )
        np.testing.assert_array_equal(
            np.flatnonzero(anyrows[qi]), inv.any_shared_bins(queries[qi])
        )
        np.testing.assert_array_equal(
            np.flatnonzero(allrows[qi]), inv.all_shared_bins(queries[qi])
        )


def test_inverted_build_device_backend_bit_exact(tmp_path, ref_in):
    """sketch_files_inverted with the device backend must produce the exact
    sign matrix of the host loop (incl. multi-entry merge + no-densify)."""
    from sketchtpu.inverted.index import sketch_files_inverted
    from sketchtpu.sketchcore.sketch_jax import DeviceSketchBackend

    files = [
        ("R6", [str(ref_in / "R6.fa.gz")]),
        ("TIGR4", [str(ref_in / "TIGR4.fa.gz")]),
        # multi-entry sample: two rows, one genome index
        ("both", [str(ref_in / "14412_3#82.contigs_velvet.fa.gz")]),
        ("both", [str(ref_in / "14412_3#84.contigs_velvet.fa.gz")]),
        ("short", [str(ref_in / "short_sequence.fa")]),
    ]
    file_order = [0, 1, 2, 2, 3]
    host_mat, host_names = sketch_files_inverted(
        files, file_order, 17, 100, True, 0, 20
    )
    dev_mat, dev_names = sketch_files_inverted(
        files, file_order, 17, 100, True, 0, 20,
        backend=DeviceSketchBackend(), threads=2,
    )
    assert host_names == dev_names
    np.testing.assert_array_equal(host_mat, dev_mat)
