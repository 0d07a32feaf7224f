"""Probe: single-k sketching via the exact full-sort kernel vs the
prefilter+compaction kernel with a one-element k set.

The original routing measurement (nthash_multik.py docstring) found the
prefilter machinery slower for single k — but that was with the
slots-on-lanes compaction layout whose hit tensor always cost
O(stream * 128). With slots on sublanes (w ~ 16-40) the balance may have
flipped, which matters for `inverted build` (single-k, the 100k-661k
sample workload). Run: `python bench/probe_singlek.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from sketchtpu.runtime import enable_compilation_cache

enable_compilation_cache()

from sketchtpu.ingest.fastx import DnaStream
from sketchtpu.sketchcore.sketch_jax import DeviceSketchBackend, _MAX_GROUP


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


def time_exact(be, streams, k, nbins):
    # the real single-k route: bin_minima_multi_k with one k goes through
    # the exact kernel with the pipelined dispatch window
    be.bin_minima_multi_k(batch(1, streams[0].seq_len, len(streams)), [k], True, nbins)
    t0 = time.time()
    r = be.bin_minima_multi_k(streams, [k], True, nbins)
    return time.time() - t0, r


def time_fast(be, streams, k, nbins):
    import jax

    from sketchtpu.hash.nthash_multik import (
        group_thresholds,
        multik_hash_bin_kernel,
        pick_block_geometry,
    )

    def run(ss):
        out = {k: np.empty((len(ss), nbins), dtype=np.uint64)}
        groups = list(be._groups_mixed_force_fast(ss, [k], nbins))
        items = []
        rows = 96
        for start, end in groups:
            group = ss[start:end]
            packed, breakbits, starts, total = be._prepare_group(group, k)
            starts_pad = np.full(rows, total, dtype=np.int32)
            starts_pad[: len(group)] = starts
            t_lo, t_hi, eligible, dens = group_thresholds(
                [s.seq_len for s in group] + [10**12] * (rows - len(group)),
                nbins,
            )
            assert eligible
            blk, w = pick_block_geometry(dens)
            fast = multik_hash_bin_kernel(
                jax.device_put(packed), jax.device_put(breakbits),
                starts_pad, np.int32(total), t_lo, t_hi,
                kmers=(k,), rc=True, num_bins=nbins,
                magic=be._magic(nbins), out_rows=rows, blk=blk, w=w,
            ) + (w,)
            items.append((start, end, fast))
        for start, end, fast in items:
            done, bad = be._collect_fast_multi_k(
                fast, [k], end - start, nbins, rows
            )
            assert done is not None and not len(bad), "fallback hit"
            out[k][start:end] = done[k][: end - start]
        return out

    run(batch(1, streams[0].seq_len, len(streams)))
    t0 = time.time()
    r = run(streams)
    return time.time() - t0, r


def main():
    be = DeviceSketchBackend()

    # force-fast grouping: same batching as _groups_mixed but ignoring the
    # min-2-kmers eligibility rule
    def groups_force_fast(ss, kmers, nbins):
        start = 0
        while start < len(ss):
            end = start
            total = 0
            while (
                end < len(ss)
                and end - start < 96
                and (end == start or total + ss[end].seq_len <= 1 << 24)
            ):
                total += ss[end].seq_len
                end += 1
            yield start, end
            start = end

    be._groups_mixed_force_fast = groups_force_fast

    for glen, count, nbins in [
        (2_000_000, 14, 1024),
        (2_000_000, 14, 100),
        (250_000, 64, 100),
    ]:
        streams = batch(2, glen, count)
        dt_e, r_e = time_exact(be, streams, 17, nbins)
        dt_f, r_f = time_fast(be, streams, 17, nbins)
        match = all(
            np.array_equal(r_e[17][i], r_f[17][i]) for i in range(count)
        )
        mb = glen * count / 1e6
        print(
            f"glen={glen:>9,} x{count:>3} nbins={nbins:>5}: exact {dt_e:5.2f}s"
            f" ({mb/dt_e:5.0f} Mbase/s)  fast {dt_f:5.2f}s ({mb/dt_f:5.0f}"
            f" Mbase/s)  match={match}",
            flush=True,
        )


if __name__ == "__main__":
    main()
