"""Sweep compaction block geometry (blk on lanes x w on sublanes) on the
real chip: end-to-end multi-k sketching time per (blk) with w derived from
the Poisson bound, at a large- and a small-genome workload.

The trade: hit-tensor cost is O(stream * w) (w on sublanes), but slot
count — and thus candidate-sort volume — is (stream/blk) * w, and w has a
fixed +8 +6*sqrt(lam) margin per block that amortizes better over larger
blocks. Run: `python bench/sweep_compaction.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from sketchtpu.runtime import enable_compilation_cache

enable_compilation_cache()

import sketchtpu.hash.nthash_multik as mk
from sketchtpu.ingest.fastx import DnaStream
from sketchtpu.sketchcore.sketch_jax import DeviceSketchBackend

KSET = [17, 21, 25, 29, 31, 33, 37]
NBINS = 1024


def batch(seed, glen, count):
    r = np.random.default_rng(seed)
    return [
        DnaStream(
            codes=r.integers(0, 4, glen).astype(np.uint8),
            breaks=np.zeros(0, dtype=np.int64),
            acgt=np.array([1, 1, 1, 1], dtype=np.int64),
        )
        for _ in range(count)
    ]


def main():
    orig = mk.pick_block_geometry
    for glen, count in [(2_000_000, 14), (250_000, 64)]:
        for blk in (128, 256, 512, 1024):
            mk.pick_block_geometry = (
                lambda d, _blk=blk: orig(d, blk=_blk)
            )
            _, w = mk.pick_block_geometry(
                mk.group_thresholds([glen] * count, NBINS)[3]
            )
            be = DeviceSketchBackend()
            be.bin_minima_multi_k(batch(1, glen, count), KSET, True, NBINS)
            times = []
            for rep in range(3):
                streams = batch(2 + rep, glen, count)
                t0 = time.time()
                be.bin_minima_multi_k(streams, KSET, True, NBINS)
                times.append(time.time() - t0)
            dt = min(times)
            rate = glen * count * len(KSET) / dt / 1e6
            slots = (1 << 24) // blk * w * len(KSET)
            print(
                f"glen={glen:>9,} x{count:>3} blk={blk:>4} w={w:>3} "
                f"slots={slots/1e6:5.1f}M  {dt:6.2f}s  {rate:6.0f} Mbase-k/s",
                flush=True,
            )
    mk.pick_block_geometry = orig


if __name__ == "__main__":
    main()
