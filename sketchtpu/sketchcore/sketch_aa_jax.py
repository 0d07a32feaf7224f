"""Batched TPU amino-acid / 3Di sketching backend.

Mirrors the DNA backend (sketch_jax.py): sample streams are concatenated
into one device program per k (aaHash -> Mersenne mod -> magic-divide
binning -> sort-based scatter-min), so the whole batch's bin minima come
back in one transfer. Window emission masks are computed on the host with
the exact oracle (hash/aahash_np.aa_window_valid — including the
reference's final-window quirk, aahash_iterator.rs:138-210) and shipped
as one bit per position, which makes device results bit-identical to the
host path by construction (asserted by tests/test_aa_device.py).
"""

from __future__ import annotations

import numpy as np

from ..constants import num_bins as num_bins_fn
from ..hash.aahash_jax import AA_COMPACT, aa_hash_bin_kernel, aa_tap_tables_u32
from ..hash.aahash_np import aa_window_valid
from ..hash.nthash_jax import MAX_K, combine_bin_minima
from ..ingest.fastx import AaStream
from .sketch import Sketch
from .sketch_jax import _MAX_GROUP, _bucket_size, DeviceSketchBackend


class DeviceAaSketchBackend:
    def __init__(self):
        from ..runtime import enable_compilation_cache

        enable_compilation_cache()
        self._magic = DeviceSketchBackend()._magic

    def _groups(self, streams):
        start = 0
        batch_limit = 1 << 24
        while start < len(streams):
            end = start
            total = 0
            while (
                end < len(streams)
                and end - start < _MAX_GROUP
                and (end == start or total + streams[end].seq_len <= batch_limit)
            ):
                total += streams[end].seq_len
                end += 1
            yield start, end
            start = end

    def bin_minima_multi_k(
        self,
        streams: list[AaStream],
        kmers: list[int],
        level: int,
        nbins: int,
    ) -> dict[int, np.ndarray]:
        import jax

        out = {kk: np.empty((len(streams), nbins), dtype=np.uint64) for kk in kmers}

        # Same dispatch discipline as the DNA backend: issue a window of
        # groups (round-robin over local devices — sketching is per-sample
        # independent) before collecting any result, overlapping host mask
        # packing with device compute.
        devices = jax.local_devices()
        window = max(8, 2 * len(devices))
        in_flight: list[tuple] = []

        def dispatch(start: int, end: int, dev):
            group = streams[start:end]
            total = sum(s.seq_len for s in group)
            n_pad = _bucket_size(total + MAX_K)
            codes = np.zeros(n_pad, dtype=np.uint8)
            starts = np.full(_MAX_GROUP, total, dtype=np.int32)
            pos = 0
            for i, s in enumerate(group):
                codes[pos : pos + s.seq_len] = AA_COMPACT[s.seq]
                starts[i] = pos
                pos += s.seq_len
            codes_d = jax.device_put(codes, dev)

            results = {}
            for kk in kmers:
                # emission mask: exact host oracle per sample, concatenated
                vflags = np.zeros(n_pad, dtype=np.uint8)
                p = 0
                for s in group:
                    wv = aa_window_valid(s.seq, kk)  # raises like the host
                    vflags[p : p + wv.shape[0]] = wv
                    p += s.seq_len
                validbits = np.packbits(vflags, bitorder="little")
                results[kk] = aa_hash_bin_kernel(
                    codes_d,
                    validbits,
                    starts,
                    np.int32(kk),
                    aa_tap_tables_u32(kk, level),
                    num_bins=nbins,
                    magic=self._magic(nbins),
                    out_rows=_MAX_GROUP,
                )
            return start, end, results

        def collect(item):
            start, end, results = item
            g = end - start
            for kk, (min_hi, min_lo, found) in results.items():
                mh = np.asarray(min_hi).reshape(_MAX_GROUP, nbins)[:g]
                ml = np.asarray(min_lo).reshape(_MAX_GROUP, nbins)[:g]
                fd = np.asarray(found).reshape(_MAX_GROUP, nbins)[:g]
                out[kk][start:end] = combine_bin_minima(mh, ml, fd)

        for gi, (start, end) in enumerate(self._groups(streams)):
            if len(in_flight) >= window:
                collect(in_flight.pop(0))
            in_flight.append(dispatch(start, end, devices[gi % len(devices)]))
        for item in in_flight:
            collect(item)
        return out

    def sketch_aa_streams(
        self,
        streams: list[AaStream],
        names: list[str],
        kmers: list[int],
        sketch_size: int,
        level: int,
        rc: bool,
    ) -> list[Sketch]:
        from .signs import densify, fill_usigs

        _s64, nbins, _u = num_bins_fn(sketch_size)
        for s, name in zip(streams, names):
            if s.seq_len == 0:
                raise ValueError(f"{name} has no valid sequence")
        bins_per_k = self.bin_minima_multi_k(streams, kmers, level, nbins)
        out = []
        for i, (stream, name) in enumerate(zip(streams, names)):
            usigs_parts = []
            densified_any = False
            for kk in kmers:
                binned = bins_per_k[kk][i].copy()
                densified_any |= densify(binned)
                usigs_parts.append(fill_usigs(binned))
            out.append(
                Sketch(
                    name=name,
                    rc=rc,
                    reads=False,
                    seq_length=stream.seq_len,
                    densified=densified_any,
                    acgt=(0, 0, 0, 0),
                    non_acgt=stream.invalid_count,
                    usigs=np.concatenate(usigs_parts),
                )
            )
        return out
