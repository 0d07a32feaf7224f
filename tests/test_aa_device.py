"""Parity: device AA/3Di sketching backend vs the host oracle.

The device kernel must produce bit-identical sketches — same usigs bytes,
same densified flag — for the reference AA fixture and for synthetic edge
cases (invalid residues, SEQSEP record separators, short sequences,
multi-sample groups, all three reduced-alphabet levels).
"""

import numpy as np
import pytest

from sketchtpu.ingest.fastx import AaStream, SEQSEP, read_aa_sample
from sketchtpu.sketchcore.sketch import sketch_aa_sample
from sketchtpu.sketchcore.sketch_aa_jax import DeviceAaSketchBackend


def _host_sketches(streams, names, kmers, sketch_size, level):
    return [
        sketch_aa_sample(s, n, kmers, sketch_size, level)
        for s, n in zip(streams, names)
    ]


def _assert_equal(dev, host):
    assert len(dev) == len(host)
    for d, h in zip(dev, host):
        assert d.name == h.name
        assert d.densified == h.densified
        assert d.seq_length == h.seq_length
        assert d.non_acgt == h.non_acgt
        np.testing.assert_array_equal(d.usigs, h.usigs)


def _rand_stream(rng, n, p_invalid=0.02):
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWYacdefghiklmnpqrstvwy",
                            dtype=np.uint8)
    seq = letters[rng.integers(0, letters.size, n)]
    bad = rng.random(n) < p_invalid
    seq = np.where(bad, SEQSEP, seq).astype(np.uint8)
    return AaStream(seq=seq, invalid_count=int(bad.sum()))


@pytest.mark.parametrize("level", [1, 2, 3])
def test_aa_device_matches_host_synthetic(level):
    rng = np.random.default_rng(level)
    streams = [_rand_stream(rng, n) for n in (40, 97, 513, 64, 2048, 31, 300,
                                              1200, 55)]
    names = [f"s{i}" for i in range(len(streams))]
    kmers = [6, 9, 14]
    host = _host_sketches(streams, names, kmers, 64, level)
    dev = DeviceAaSketchBackend().sketch_aa_streams(
        streams, names, kmers, 64, level, rc=True
    )
    _assert_equal(dev, host)


def test_aa_device_matches_host_fixture(ref_in):
    streams = read_aa_sample([str(ref_in / "test_aa_sequence.fa")], False)
    names = ["aa"]
    kmers = [11, 13]
    host = _host_sketches(streams, names, kmers, 1000, 1)
    dev = DeviceAaSketchBackend().sketch_aa_streams(
        streams, names, kmers, 1000, 1, rc=True
    )
    _assert_equal(dev, host)


def test_aa_device_final_window_quirk():
    """A sequence whose last window is only reachable when the preceding
    char is valid — the reference's final-window rule."""
    k = 5
    # trailing k+1 valid chars -> final window emitted
    s1 = AaStream(seq=np.frombuffer(b"ACDEFGHIKL", dtype=np.uint8).copy())
    # invalid char at position L-k-1 -> final window suppressed even though
    # its own k chars are valid; interior windows before the break remain
    raw = bytearray(b"ACDEFGHIKLMN")
    raw[len(raw) - k - 1] = SEQSEP
    s2 = AaStream(seq=np.frombuffer(bytes(raw), dtype=np.uint8).copy(),
                  invalid_count=1)
    streams = [s1, s2]
    names = ["a", "b"]
    host = _host_sketches(streams, names, [k], 64, 1)
    dev = DeviceAaSketchBackend().sketch_aa_streams(
        streams, names, [k], 64, 1, rc=True
    )
    _assert_equal(dev, host)


def test_aa_device_kmer_too_large():
    s = AaStream(seq=np.frombuffer(b"ACDEF", dtype=np.uint8).copy())
    with pytest.raises(ValueError, match="K-mer larger"):
        DeviceAaSketchBackend().sketch_aa_streams(
            [s], ["x"], [6], 64, 1, rc=True
        )


@pytest.mark.parametrize("level", [1, 2, 3])
def test_multik_fused_path_bit_exact(level, monkeypatch):
    """Samples big enough for the residual prefilter route through the
    fused multi-k kernel (one pass shared across k); results must be
    bit-identical to the host oracle, and the per-k exact kernel must not
    run (the fallback is a <1% event and deterministic per seed)."""
    from sketchtpu.sketchcore import sketch_aa_jax

    calls = {"exact": 0}
    orig = sketch_aa_jax.aa_hash_bin_kernel

    def spy(*a, **kw):
        calls["exact"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(sketch_aa_jax, "aa_hash_bin_kernel", spy)

    rng = np.random.default_rng(40 + level)
    streams = [_rand_stream(rng, int(n)) for n in (60_000, 25_000, 90_000)]
    names = [f"p{i}" for i in range(len(streams))]
    kmers = [6, 9, 12]

    host = _host_sketches(streams, names, kmers, 100, level)
    dev = DeviceAaSketchBackend().sketch_aa_streams(
        streams, names, kmers, 100, level, True
    )
    _assert_equal(dev, host)
    assert calls["exact"] == 0, "fused multi-k path did not engage"


def test_multik_mixed_small_large_groups():
    """Small (exact-path) and large (fused-path) samples interleaved in
    one batch: group routing must preserve order and bit-exactness."""
    rng = np.random.default_rng(77)
    sizes = [400, 30_000, 1_200, 45_000, 700]
    streams = [_rand_stream(rng, n) for n in sizes]
    names = [f"p{i}" for i in range(len(streams))]
    kmers = [5, 8]

    host = _host_sketches(streams, names, kmers, 64, 2)
    dev = DeviceAaSketchBackend().sketch_aa_streams(
        streams, names, kmers, 64, 2, True
    )
    _assert_equal(dev, host)


def test_oversized_aa_stream_segmented(monkeypatch):
    """AA streams past the segment budget split into overlapping segments
    with globally-sliced validity masks (the final-window quirk is a
    whole-sequence property) and min-combine bit-exactly."""
    from sketchtpu.sketchcore import sketch_aa_jax

    monkeypatch.setattr(sketch_aa_jax, "_SEG_BASES", 30_000)
    rng = np.random.default_rng(91)
    streams = [_rand_stream(rng, n) for n in (5_000, 110_000, 70_000)]
    names = [f"p{i}" for i in range(len(streams))]
    kmers = [6, 11]

    host = _host_sketches(streams, names, kmers, 100, 1)
    dev = DeviceAaSketchBackend().sketch_aa_streams(
        streams, names, kmers, 100, 1, True
    )
    _assert_equal(dev, host)


def test_aa_row_level_fallback_bit_exact(monkeypatch):
    """A genome whose bin the prefilter lost is redone alone via the exact
    per-k kernel; the rest of the group keeps the fast result (bit-exact
    vs the host oracle)."""
    from sketchtpu.hash import aahash_multik as am
    from sketchtpu.sketchcore import sketch_aa_jax

    orig_multik = am.multik_aa_hash_bin_kernel

    def lose_a_bin(*a, **kw):
        o_hi, o_lo, found, overflow, *rest = orig_multik(*a, **kw)
        f = np.asarray(found).copy()
        shape = f.shape
        f3 = f.reshape(len(kw["kmers"]), kw["out_rows"], kw["num_bins"])
        f3[0, 1, 3] = False
        return (o_hi, o_lo, f3.reshape(shape), overflow, *rest)

    monkeypatch.setattr(am, "multik_aa_hash_bin_kernel", lose_a_bin)
    calls = {"exact": 0}
    orig_exact = sketch_aa_jax.aa_hash_bin_kernel
    orig_exact_dev = sketch_aa_jax.aa_hash_bin_kernel_devmask

    def spy(*a, **kw):
        calls["exact"] += 1
        return orig_exact(*a, **kw)

    def spy_dev(*a, **kw):
        calls["exact"] += 1
        return orig_exact_dev(*a, **kw)

    monkeypatch.setattr(sketch_aa_jax, "aa_hash_bin_kernel", spy)
    monkeypatch.setattr(sketch_aa_jax, "aa_hash_bin_kernel_devmask", spy_dev)

    rng = np.random.default_rng(77)
    streams = [_rand_stream(rng, int(n)) for n in (60_000, 25_000, 90_000)]
    names = [f"p{i}" for i in range(len(streams))]
    kmers = [6, 9]
    host = _host_sketches(streams, names, kmers, 100, 1)
    dev = DeviceAaSketchBackend().sketch_aa_streams(
        streams, names, kmers, 100, 1, True
    )
    _assert_equal(dev, host)
    # the redo ran the exact kernel for the single bad row only:
    # one dispatch_exact call = len(kmers) kernel invocations
    assert calls["exact"] == len(kmers), calls


def test_device_window_mask_matches_oracle_fuzz():
    """_aa_window_mask_device == aa_window_valid per sample, including the
    final-window quirk (with and without a trailing SEQSEP), padding rows,
    the padded tail, and the reachability condition (counts == 0 exactly
    when the host oracle raises)."""
    import jax.numpy as jnp

    from sketchtpu.hash.aahash_jax import AA_COMPACT, _aa_window_mask_device
    from sketchtpu.hash.aahash_np import aa_window_valid
    from sketchtpu.hash.nthash_jax import MAX_K

    letters = np.frombuffer(
        b"ACDEFGHIKLMNPQRSTVWYacdefghiklmnpqrstvwy", dtype=np.uint8
    )
    rng = np.random.default_rng(11)
    for trial in range(60):
        k = int(rng.integers(3, 13))
        seqs = []
        for _ in range(int(rng.integers(1, 7))):
            n = int(rng.integers(k, 50))
            s = letters[rng.integers(0, letters.size, n)].copy()
            s[rng.random(n) < 0.15] = SEQSEP
            if rng.random() < 0.7:  # fastx appends SEQSEP per record;
                s = np.append(s, np.uint8(SEQSEP))  # concat_fasta does not
            seqs.append(s)
        total = sum(len(s) for s in seqs)
        out_rows = len(seqs) + int(rng.integers(0, 3))
        n_pad = ((total + MAX_K + 255) // 256) * 256
        codes = np.zeros(n_pad, dtype=np.uint8)
        starts = np.full(out_rows, total, dtype=np.int32)
        pos = 0
        for i, s in enumerate(seqs):
            codes[pos : pos + len(s)] = AA_COMPACT[s]
            starts[i] = pos
            pos += len(s)
        m = n_pad - MAX_K
        ok, counts = _aa_window_mask_device(
            jnp.asarray((codes < 20).astype(np.int32)),
            jnp.asarray(starts),
            jnp.int32(total),
            jnp.int32(k),
            m,
            out_rows,
        )
        ok, counts = np.asarray(ok), np.asarray(counts)
        p = 0
        for i, s in enumerate(seqs):
            exp = np.zeros(len(s), dtype=bool)
            try:
                wv = aa_window_valid(s, k)
                exp[: wv.shape[0]] = wv
                assert counts[i] > 0, (trial, i)
                np.testing.assert_array_equal(ok[p : p + len(s)], exp)
            except ValueError:
                assert counts[i] == 0, (trial, i)
            p += len(s)
        assert not ok[max(0, total - k + 1) :].any()
        assert not counts[len(seqs) :].any()
