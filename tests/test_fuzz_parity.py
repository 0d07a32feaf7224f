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
    kmers = sorted(rng.choice(np.arange(5, 32), size=n_k, replace=False).tolist())
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
