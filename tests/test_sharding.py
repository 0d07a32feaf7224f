"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from sketchtpu.dist.jaccard_np import samebits_matrix


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()


def test_sharded_samebits_matches_host(eight_devices):
    from sketchtpu.shard.mesh import ShardedSamebitsEngine, make_mesh

    s64 = 16
    w = s64 * 14
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**63, (37, w), dtype=np.uint64)
    b = rng.integers(0, 2**63, (23, w), dtype=np.uint64)
    want = samebits_matrix(a, b)

    for rows, words in [(8, 1), (4, 2), (2, 4)]:
        mesh = make_mesh(n_rows=rows, n_words=words)
        engine = ShardedSamebitsEngine(s64, mesh)
        got = engine.matrix(a, b)
        assert np.array_equal(got, want), (rows, words)


def test_sharded_dist_step(eight_devices):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sketchtpu.shard.mesh import make_mesh, sharded_dist_step

    mesh = make_mesh(n_rows=4, n_words=2)
    s64 = 16
    w2 = s64 * 14 * 2
    rng = np.random.default_rng(1)
    a = jax.device_put(
        rng.integers(0, 2**32, (16, w2), dtype=np.uint32),
        NamedSharding(mesh, P("rows", "words")),
    )
    b = jax.device_put(
        rng.integers(0, 2**32, (8, w2), dtype=np.uint32),
        NamedSharding(mesh, P(None, "words")),
    )
    out = np.asarray(sharded_dist_step(a, b, s64=s64, mesh=mesh, k=21.0, ani=False))
    sb = samebits_matrix(
        np.asarray(a).view(np.uint64), np.asarray(b).view(np.uint64)
    ).astype(np.float64)
    maxnbits = float(s64 * 64)
    expected = float((s64 * 64) >> 14)
    j = (np.maximum(sb - expected, 0) * maxnbits / (maxnbits - expected)) / maxnbits
    np.testing.assert_allclose(out, (1.0 - j).astype(np.float32), atol=1e-6)


def test_graft_entry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 128)
    g.dryrun_multichip(8)
