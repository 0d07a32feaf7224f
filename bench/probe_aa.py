"""Probe: amino-acid multi-k sketching rate on the device backend.

VERDICT round-1 item 6 target: >= 30 Maa*k/s end-to-end at the
64 x 100k-aa shape (previously 7.6 Maa*k/s, dispatch-bound through 30
exact-group programs; the wide 64-row exact groups cut that to 3).
Also measures the 16 x 1M-aa shape (previously ~49 Maa*k/s).

Reference hot loop being modelled: aahash_iterator.rs:25-218 (one
table lookup + srol per residue per k, single thread).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from sketchtpu.constants import SEQSEP  # noqa: E402
from sketchtpu.ingest.fastx import AaStream  # noqa: E402
from sketchtpu.sketchcore.sketch_aa_jax import DeviceAaSketchBackend  # noqa: E402

AAS = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8).copy()


def make_streams(n, length, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        seq = AAS[rng.integers(0, 20, length)]
        out.append(AaStream(seq=np.append(seq, np.uint8(SEQSEP))))
    return out


def run_shape(backend, n, length, kmers, label, reps=3):
    names = [f"p{i}" for i in range(n)]
    best = None
    for rep in range(reps):
        streams = make_streams(n, length, seed=rep)  # salt: defeat memoization
        t0 = time.perf_counter()
        sk = backend.sketch_aa_streams(streams, names, kmers, 1000, 1, True)
        dt = time.perf_counter() - t0
        assert len(sk) == n and sk[0].usigs.size
        best = dt if best is None else min(best, dt)
    rate = n * length * len(kmers) / best / 1e6
    print(f"{label}: {best:.2f} s best-of-{reps} -> {rate:.1f} Maa*k/s")
    return rate


def main():
    backend = DeviceAaSketchBackend()
    kmers = [6, 9, 12]
    # warm compile on the small shape
    backend.sketch_aa_streams(make_streams(2, 4096, 99), ["a", "b"], kmers, 1000, 1, True)
    run_shape(backend, 64, 100_000, kmers, "64 x 100k-aa (3 k, level 1)")
    run_shape(backend, 16, 1_000_000, kmers, "16 x 1M-aa  (3 k, level 1)")


if __name__ == "__main__":
    main()
