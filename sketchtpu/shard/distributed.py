"""Multi-host orchestration: sample-sharded sketching over jax.distributed.

The reference's only parallelism is a shared-memory rayon pool with a
serial writer thread (/root/reference/src/sketch/mod.rs:318-391); nothing
spans hosts. The TPU-native analogue is process-level data parallelism:
each host sketches a contiguous slice of the input list into a local
`.skd`/`.skm` shard (device-batched on its own chips, no cross-host
communication — sketching is per-sample independent), and shard files are
then concatenated. Because `.skd` is a headerless sample-major stream
(sketch_datafile.rs:14-96) and metadata merging re-bases indices exactly
like the reference's `merge` (src/utils.rs:18-33), the merged database is
byte-identical to a single-host sketch of the full input list — asserted
by tests/test_distributed.py.

Distance computation across hosts reuses the same pattern at a higher
level: rows (samples) are sharded per host by `process_slice`, each host
computes its row-block against the full column range with its local
chip mesh (mesh.py does the intra-host sharding), and long-form output
streams are concatenated in rank order. No collective is needed because
the distance matrix is written, not reduced.
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialise jax.distributed when running multi-host; returns
    (process_index, process_count). Single-process when no coordinator is
    configured (env JAX_COORDINATOR_ADDRESS or explicit args)."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def process_slice(n_items: int, process_index: int, process_count: int) -> slice:
    """Contiguous near-equal split of n_items over processes (first
    n_items % process_count processes take one extra)."""
    base = n_items // process_count
    extra = n_items % process_count
    start = process_index * base + min(process_index, extra)
    length = base + (1 if process_index < extra else 0)
    return slice(start, start + length)


def shard_prefix(output_prefix: str, process_index: int) -> str:
    return f"{output_prefix}.part{process_index}"


def triangle_row_slice(
    n: int, process_index: int, process_count: int
) -> slice:
    """Row range for one process of an upper-triangle self-distance run,
    balanced by pair count (row i carries n-1-i pairs, so equal row counts
    would leave the first rank with ~2x the work). Concatenating the ranks'
    long-form outputs in rank order reproduces the single-process file."""
    import numpy as np

    if n == 0:
        return slice(0, 0)
    cum = np.arange(n + 1, dtype=np.float64)
    cum = cum * n - cum * (cum + 1) / 2  # pairs in rows [0, i)
    total = cum[-1]
    lo = int(np.searchsorted(cum, total * process_index / process_count))
    hi = int(np.searchsorted(cum, total * (process_index + 1) / process_count))
    if process_index == process_count - 1:
        hi = n
    return slice(min(lo, n), min(hi, n))


def sketch_shard(
    output_prefix: str,
    input_files: list,
    process_index: int,
    process_count: int,
    *,
    concat_fasta: bool,
    kmers: list[int],
    sketch_bins: int,
    seq_type,
    rc: bool,
    min_count: int,
    min_qual: int,
    threads: int = 1,
    convert_pdb: bool = False,
) -> str:
    """Sketch this process's slice of the input list into
    {output_prefix}.part{i}.skd/.skm. Returns the shard prefix."""
    from ..formats.skm import MultiSketch
    from ..runtime import select_backend
    from ..sketchcore.pipeline import sketch_files

    sl = process_slice(len(input_files), process_index, process_count)
    part = input_files[sl]
    prefix = shard_prefix(output_prefix, process_index)
    backend = select_backend(seq_type, len(part))
    sketches = sketch_files(
        prefix,
        part,
        concat_fasta,
        kmers,
        sketch_bins,
        seq_type,
        rc,
        min_count,
        min_qual,
        threads=threads,
        backend=backend,
        convert_pdb=convert_pdb,
    )
    ms = MultiSketch(sketches, sketch_bins, kmers, seq_type)
    ms.save_metadata(prefix)
    return prefix


def merge_shards(output_prefix: str, process_count: int, *, keep_parts: bool = False):
    """Concatenate per-process shards into {output_prefix}.skd/.skm
    (rank-0 step after a barrier). Byte-identical to a single-process
    sketch of the full input list."""
    from ..formats.skm import MultiSketch

    merged = MultiSketch.load_metadata(shard_prefix(output_prefix, 0))
    for i in range(1, process_count):
        nxt = MultiSketch.load_metadata(shard_prefix(output_prefix, i))
        merged = merged.merge_sketches(nxt)
    with open(f"{output_prefix}.skd", "wb") as out:
        for i in range(process_count):
            with open(f"{shard_prefix(output_prefix, i)}.skd", "rb") as f:
                while True:
                    chunk = f.read(1 << 24)
                    if not chunk:
                        break
                    out.write(chunk)
    merged.save_metadata(output_prefix)
    if not keep_parts:
        for i in range(process_count):
            p = shard_prefix(output_prefix, i)
            os.remove(f"{p}.skd")
            os.remove(f"{p}.skm")
    return merged
