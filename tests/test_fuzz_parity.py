"""Randomized device/host parity sweep: mixed genome sizes (prefilter
eligible and not), random k sets, both strand modes — every configuration
must produce bit-identical sketches through the batched device backend,
exercising the fast/exact routing, group splitting and fallbacks."""

import numpy as np
import pytest

from sketchtpu.ingest.fastx import DnaStream
from sketchtpu.sketchcore.sketch import sketch_dna_sample
from sketchtpu.sketchcore.sketch_jax import DeviceSketchBackend


def _stream(rng, n, with_breaks=True):
    codes = rng.integers(0, 4, n).astype(np.uint8)
    breaks = (
        np.sort(rng.choice(n, size=rng.integers(0, 4), replace=False)).astype(
            np.int64
        )
        if with_breaks and n > 10
        else np.zeros(0, dtype=np.int64)
    )
    return DnaStream(
        codes=codes,
        breaks=np.unique(breaks),
        acgt=np.bincount(codes, minlength=4).astype(np.int64),
    )


@pytest.mark.parametrize("seed", range(6))
def test_random_config_bit_exact(seed):
    rng = np.random.default_rng(seed)
    sizes = rng.choice(
        [120, 900, 5_000, 60_000, 200_000, 400_000],
        size=rng.integers(2, 9),
    )
    streams = [_stream(rng, int(s)) for s in sizes]
    names = [f"g{i}" for i in range(len(streams))]
    n_k = int(rng.integers(1, 4))
    # full supported range: k >= 32 exercises the wrapped 31/33-period
    # rotation tables and the widest prefilter windows (MAX_K = 64)
    kmers = sorted(rng.choice(np.arange(5, 65), size=n_k, replace=False).tolist())
    rc = bool(rng.integers(0, 2))
    sketch_size = int(rng.choice([64, 100, 256]))

    def host_one(s, name):
        try:
            return sketch_dna_sample(s, name, kmers, sketch_size, rc, 0)
        except ValueError as e:
            return ("err", str(e))

    host = [host_one(s, n) for s, n in zip(streams, names)]
    backend = DeviceSketchBackend()
    if any(isinstance(h, tuple) for h in host):
        with pytest.raises(ValueError):
            backend.sketch_dna_streams(streams, names, kmers, sketch_size, rc, 0)
        return
    dev = backend.sketch_dna_streams(streams, names, kmers, sketch_size, rc, 0)
    for h, d in zip(host, dev):
        assert np.array_equal(h.usigs, d.usigs), (seed, h.name)
        assert h.densified == d.densified
        assert h.seq_length == d.seq_length


@pytest.mark.parametrize("seed", range(3))
def test_random_reads_config_bit_exact(seed):
    """Reads (FASTQ) streams route through the order-dependent count
    filter: in-order device hashing + host filtering, with the hash
    kernels for all (stream, k) pairs dispatched ahead round-robin over
    the local devices. Mixed with assembly streams to exercise both
    paths in one batch."""
    rng = np.random.default_rng(300 + seed)
    streams = []
    for n in rng.integers(200, 40_000, size=rng.integers(2, 6)):
        s = _stream(rng, int(n))
        s.reads = bool(rng.integers(0, 2))
        streams.append(s)
    if not any(s.reads for s in streams):
        streams[0].reads = True
    names = [f"r{i}" for i in range(len(streams))]
    kmers = sorted(
        rng.choice(np.arange(5, 28), size=rng.integers(1, 4), replace=False)
        .tolist()
    )
    rc = bool(rng.integers(0, 2))
    sketch_size = int(rng.choice([64, 100]))
    min_count = int(rng.integers(1, 4))

    # Random reads + min_count can legitimately filter away every k-mer
    # (all bins empty). The reference's densify would hang on that input
    # (mod.rs:250-253); both our paths must raise the same clean error.
    try:
        host = [
            sketch_dna_sample(s, n, kmers, sketch_size, rc, min_count)
            for s, n in zip(streams, names)
        ]
    except ValueError as e:
        assert "K-mer larger than smallest valid sequence" in str(e)
        with pytest.raises(ValueError, match="K-mer larger"):
            DeviceSketchBackend().sketch_dna_streams(
                streams, names, kmers, sketch_size, rc, min_count
            )
        return
    dev = DeviceSketchBackend().sketch_dna_streams(
        streams, names, kmers, sketch_size, rc, min_count
    )
    for h, d in zip(host, dev):
        assert np.array_equal(h.usigs, d.usigs), (seed, h.name)
        assert h.seq_length == d.seq_length
        assert h.reads == d.reads
    # the count-filter stage runs in a host pool; each (stream, k) filter
    # loop is self-contained so worker count must not change any bit
    dev4 = DeviceSketchBackend().sketch_dna_streams(
        streams, names, kmers, sketch_size, rc, min_count, threads=4
    )
    for h, d in zip(host, dev4):
        assert np.array_equal(h.usigs, d.usigs), (seed, h.name, "threads=4")


def test_wide_exact_group_bit_exact():
    """>7 small genomes in one exact dispatch take the WIDE path (genome
    index on a third sort key, bin_min_sorted out_rows > 7); results must
    equal the host oracle bit-for-bit. Single-k + >1MB disables the fast
    kernel, so with 20 small streams the group builder emits one wide
    group (g=20 -> out_rows=64)."""
    rng = np.random.default_rng(77)
    # lengths < 16*128/0.125 = 16384 keep every stream too dense for the
    # fast prefilter -> all-exact wide group
    streams = [_stream(rng, int(n)) for n in rng.integers(2_000, 15_000, 20)]
    names = [f"g{i}" for i in range(20)]
    kmers = [21, 27]
    host = [
        sketch_dna_sample(s, n, kmers, 100, True, 0)
        for s, n in zip(streams, names)
    ]
    dev = DeviceSketchBackend().sketch_dna_streams(
        streams, names, kmers, 100, True, 0
    )
    for h, d in zip(host, dev):
        assert np.array_equal(h.usigs, d.usigs), h.name


@pytest.mark.parametrize("seed", range(3))
def test_random_aa_config_bit_exact(seed):
    from sketchtpu.constants import SEQSEP
    from sketchtpu.ingest.fastx import AaStream
    from sketchtpu.sketchcore.sketch import sketch_aa_sample
    from sketchtpu.sketchcore.sketch_aa_jax import DeviceAaSketchBackend

    rng = np.random.default_rng(100 + seed)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWYacdefghiklmnpqrstvwy",
                            dtype=np.uint8)
    streams = []
    for n in rng.integers(30, 3000, size=rng.integers(2, 10)):
        seq = letters[rng.integers(0, letters.size, n)]
        bad = rng.random(n) < 0.03
        streams.append(
            AaStream(seq=np.where(bad, SEQSEP, seq).astype(np.uint8),
                     invalid_count=int(bad.sum()))
        )
    names = [f"p{i}" for i in range(len(streams))]
    # up to and past the device tap-table width (aaHash allows any k)
    kmers = sorted(rng.choice(np.arange(4, 70), size=rng.integers(1, 3),
                              replace=False).tolist())
    level = int(rng.integers(1, 4))
    sketch_size = int(rng.choice([64, 128]))

    def host_one(s, name):
        try:
            return sketch_aa_sample(s, name, kmers, sketch_size, level)
        except ValueError as e:
            return ("err", str(e))

    host = [host_one(s, n) for s, n in zip(streams, names)]
    backend = DeviceAaSketchBackend()
    if any(isinstance(h, tuple) for h in host):
        with pytest.raises(ValueError):
            backend.sketch_aa_streams(streams, names, kmers, sketch_size,
                                      level, True)
        return
    dev = backend.sketch_aa_streams(streams, names, kmers, sketch_size,
                                    level, True)
    for h, d in zip(host, dev):
        assert np.array_equal(h.usigs, d.usigs), (seed, h.name)


@pytest.mark.parametrize("seed", range(3))
def test_random_inverted_engine_parity(seed):
    from sketchtpu.inverted.device import DeviceInvertedEngine
    from sketchtpu.inverted.index import Inverted
    from sketchtpu.sketchcore.sketch import HashType

    rng = np.random.default_rng(200 + seed)
    n, s = 96, 32  # fixed shapes: one compile across seeds
    # low sign cardinality so matches actually occur
    mat = rng.integers(0, 12, (n, s)).astype(np.uint16)
    inv = Inverted(sign_matrix=mat, sample_names=[f"g{i}" for i in range(n)],
                   kmer_size=17, rc=True, hash_type=HashType("dna"))
    eng = DeviceInvertedEngine(mat, tile=32)
    queries = rng.integers(0, 12, (5, s)).astype(np.uint16)

    got = eng.match_counts(queries)
    want = np.stack([inv.query_match_count(q) for q in queries])
    np.testing.assert_array_equal(got, want)

    got_any = eng.any_shared_rows(queries)
    for qi, q in enumerate(queries):
        np.testing.assert_array_equal(
            np.flatnonzero(got_any[qi]), inv.any_shared_bins(q)
        )

    # brute-force pair count oracle
    eq_any = (mat[:, None, :] == mat[None, :, :]).any(axis=2)
    want_pairs = int(np.triu(eq_any, 1).sum())
    assert eng.any_shared_bin_count() == want_pairs


def test_oversized_stream_segmented(monkeypatch):
    """Streams past _SEG_BASES are split into overlapping standard-size
    segments whose per-bin minima min-combine to the whole stream's
    (no giant one-off compile, no host-oracle detour), interleaved with
    normal groups, preserving order and bit-exactness."""
    from sketchtpu.sketchcore import sketch_jax

    monkeypatch.setattr(sketch_jax, "_SEG_BASES", 50_000)
    rng = np.random.default_rng(7)
    sizes = [20_000, 120_000, 8_000, 90_000]
    streams = [_stream(rng, n) for n in sizes]
    names = [f"g{i}" for i in range(len(streams))]
    kmers = [15, 19]

    host = [
        sketch_dna_sample(s, n, kmers, 100, True, 0)
        for s, n in zip(streams, names)
    ]

    import sketchtpu.sketchcore.sketch as sketch_mod

    def boom(*a, **kw):  # the oracle must not run inside the backend
        raise AssertionError("host oracle called for oversized stream")

    monkeypatch.setattr(sketch_mod, "sketch_dna_sample", boom)
    dev = DeviceSketchBackend().sketch_dna_streams(
        streams, names, kmers, 100, True, 0
    )
    assert [d.name for d in dev] == names
    for h, d in zip(host, dev):
        assert np.array_equal(h.usigs, d.usigs), h.name
        assert h.seq_length == d.seq_length


@pytest.mark.parametrize("pf", ["0", "1"])
def test_oversized_reads_stream_segmented(monkeypatch, pf):
    """The order-dependent FASTQ count-filter path over an oversized
    stream: segment-concatenated in-order signs must equal the whole
    stream's, so the filtered sketch is bit-exact — with the device
    consult-superset prefilter both off (default) and on (opt-in;
    per-segment as of round 5)."""
    from sketchtpu.sketchcore import sketch_jax

    monkeypatch.setenv("SKETCHTPU_FASTQ_PREFILTER", pf)
    monkeypatch.setattr(sketch_jax, "_SEG_BASES", 40_000)
    rng = np.random.default_rng(13)
    # simulate concatenated reads re-covering one genome (so k-mers recur
    # and survive the min-count filter): 5x coverage, many record breaks
    genome = rng.integers(0, 4, 30_000).astype(np.uint8)
    codes = np.tile(genome, 5)
    n = codes.shape[0]
    s = DnaStream(
        codes=codes,
        breaks=np.unique(
            np.sort(rng.choice(n, size=600, replace=False)).astype(np.int64)
        ),
        acgt=np.bincount(codes, minlength=4).astype(np.int64),
        reads=True,
    )
    kmers = [17, 21]

    host = sketch_dna_sample(s, "r0", kmers, 100, True, 2)
    dev = DeviceSketchBackend().sketch_dna_streams(
        [s], ["r0"], kmers, 100, True, 2
    )[0]
    assert np.array_equal(host.usigs, dev.usigs)
    assert host.seq_length == dev.seq_length


def test_segment_boundary_breaks(monkeypatch):
    """Breaks landing exactly on segment cut points (p0, p1) and inside
    the overlap region must not lose or duplicate any valid window."""
    from sketchtpu.sketchcore import sketch_jax

    seg = 10_000
    monkeypatch.setattr(sketch_jax, "_SEG_BASES", seg)
    rng = np.random.default_rng(3)
    n = 45_000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    kmers = [15, 31]
    # breaks at every segment cut, at cut +/- (k-1), inside overlaps, at 0/n
    b = []
    for p in range(0, n + 1, seg):
        for d in (-31, -14, -1, 0, 1, 14, 30, 31):
            if 0 <= p + d <= n:
                b.append(p + d)
    s = DnaStream(
        codes=codes,
        breaks=np.unique(np.array(b, dtype=np.int64)),
        acgt=np.bincount(codes, minlength=4).astype(np.int64),
    )
    host = sketch_dna_sample(s, "g", kmers, 64, True, 0)
    dev = DeviceSketchBackend().sketch_dna_streams([s], ["g"], kmers, 64, True, 0)[0]
    assert np.array_equal(host.usigs, dev.usigs)


def test_k_beyond_device_table_width():
    """k > MAX_K (the device tap-table width) must still sketch: the
    reference accepts any k >= 3 (io.rs:154-156). The device backend
    routes such requests to the host oracle; results must match it, for
    assemblies (bin minima), reads (in-order count filter), and AA."""
    from sketchtpu.hash.nthash_jax import MAX_K
    from sketchtpu.sketchcore.sketch import sketch_aa_sample
    from sketchtpu.ingest.fastx import AaStream
    from sketchtpu.sketchcore.sketch_aa_jax import DeviceAaSketchBackend

    rng = np.random.default_rng(11)
    kmers = [21, MAX_K + 1, MAX_K + 30]
    streams = [_stream(rng, n) for n in (5_000, 20_000)]
    names = ["a", "b"]
    host = [
        sketch_dna_sample(s, n, kmers, 100, True, 0)
        for s, n in zip(streams, names)
    ]
    dev = DeviceSketchBackend().sketch_dna_streams(
        streams, names, kmers, 100, True, 0
    )
    for h, d in zip(host, dev):
        assert np.array_equal(h.usigs, d.usigs)

    # duplicate the sequence (break between copies) so k-mer counts reach
    # min_count=2 under the FASTQ filter
    half = rng.integers(0, 4, 15_000).astype(np.uint8)
    codes2 = np.concatenate([half, half])
    reads = DnaStream(
        codes=codes2,
        breaks=np.array([15_000], dtype=np.int64),
        acgt=np.bincount(codes2, minlength=4).astype(np.int64),
    )
    reads.reads = True
    hr = sketch_dna_sample(reads, "r", [MAX_K + 5], 64, True, 2)
    dr = DeviceSketchBackend().sketch_dna_streams(
        [reads], ["r"], [MAX_K + 5], 64, True, 2
    )[0]
    assert np.array_equal(hr.usigs, dr.usigs)

    aa_codes = rng.integers(0, 20, 2_000)
    seq = "".join("ACDEFGHIKLMNPQRSTVWY"[c] for c in aa_codes)
    aa = AaStream(seq=np.frombuffer(seq.encode(), dtype=np.uint8).copy())
    ha = sketch_aa_sample(aa, "p", [MAX_K + 2], 64, 1)
    da_bins = DeviceAaSketchBackend().bin_minima_multi_k(
        [aa], [MAX_K + 2], 1, 64
    )
    from sketchtpu.hash.aahash_np import aahash_valid
    from sketchtpu.sketchcore.signs import bin_minima, signs_from_hashes

    expect = bin_minima(
        signs_from_hashes(aahash_valid(aa, MAX_K + 2, 1)), 64
    )
    assert np.array_equal(da_bins[MAX_K + 2][0], expect)
    assert ha is not None
