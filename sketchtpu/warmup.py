"""`sketchtpu warmup` — populate the persistent XLA compile cache for a
given sketch/distance configuration.

The reference has no compile step; on TPU the first dispatch of each
program pays a (sometimes multi-minute, via a remote compile service)
XLA compilation. This command drives the REAL CLI code paths against
synthetic inputs sized like the user's workload, so every later
invocation with the same configuration hits the persistent cache
(runtime.enable_compilation_cache) and its wall clock is honest.

Zero drift by construction: nothing is lowered by hand — the warmup
invokes `cli.main` on a synthetic database / synthetic genomes, so the
engine selection, padding, tiling, and kernel choices are exactly the
production ones. Distance programs specialize on the padded column
count, so pass --db-size near your real database size; row-block
programs come in a full-block and a tail-block shape, so warmup runs
the first AND last multi-process rank slice of the synthetic DB.
"""

from __future__ import annotations

import logging
import os
import sys
import tempfile
import time

import numpy as np

log = logging.getLogger("sketchtpu")

_WARM_ROWS = 2048  # one full row block per rank slice


def build_synth_db(prefix: str, n: int, sketch_size: int, kmers: list[int],
                   seq_type: str = "dna", level: int = 1) -> str:
    """Synthesize an on-disk sketch DB with random bit-planes (program
    shapes depend only on geometry, not sign values)."""
    from .formats.skd import SketchDataWriter
    from .formats.skm import MultiSketch
    from .sketchcore.sketch import HashType, Sketch, num_bins

    _s64, _bins, usize = num_bins(sketch_size)
    rng = np.random.default_rng(0)
    sketches = []
    with SketchDataWriter(f"{prefix}.skd") as w:
        for i in range(n):
            usigs = rng.integers(
                0, 1 << 62, size=len(kmers) * usize, dtype=np.uint64
            )
            sk = Sketch(
                name=f"w{i}",
                rc=True,
                reads=False,
                seq_length=2_000_000,
                densified=False,
                acgt=(1, 1, 1, 1),
                non_acgt=0,
                usigs=usigs,
            )
            sk.index = w.write_sketch(usigs)
            sk.usigs = None
            sketches.append(sk)
    ht = HashType(seq_type if seq_type != "pdb" else "aa", level)
    MultiSketch(sketches, sketch_size, kmers, ht).save_metadata(prefix)
    return prefix


def _write_synth_fasta(path: str, length: int, seq_type: str, seed: int):
    rng = np.random.default_rng(seed)
    alphabet = b"ACGT" if seq_type == "dna" else b"ACDEFGHIKLMNPQRSTVWY"
    letters = np.frombuffer(alphabet, dtype=np.uint8)
    seq = letters[rng.integers(0, len(letters), length)].tobytes()
    with open(path, "wb") as f:
        f.write(b">warmup\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i : i + 80] + b"\n")


def _run_cli(argv: list[str], label: str) -> float:
    from . import cli

    t0 = time.time()
    log.info("warmup: %s (%s)", label, " ".join(argv))
    rc = cli.main(argv + ["--quiet"])
    dt = time.time() - t0
    if rc:
        raise RuntimeError(f"warmup step {label!r} failed (rc={rc})")
    print(f"  warmed {label}: {dt:.1f} s", file=sys.stderr)
    return dt


def run_warmup(args) -> int:
    from .ingest import inputs as io_inputs

    kmers = io_inputs.parse_kmers(args.k_vals, args.k_seq) or [21]
    modes = set((args.modes or "sketch,dense,knn").split(","))
    genome_sizes = [int(x) for x in args.genome_sizes.split(",") if x]
    total0 = time.time()
    with tempfile.TemporaryDirectory(prefix="sketchtpu_warmup_") as tmp:
        if "sketch" in modes:
            # sketching programs specialize on the padded stream bucket:
            # one synthetic genome per requested size covers the
            # pack/hash/compaction/sort kernels for that bucket
            for gs in genome_sizes:
                paths = []
                for i in range(2):  # two samples: group batching paths
                    p = os.path.join(tmp, f"g{gs}_{i}.fa")
                    _write_synth_fasta(p, gs, args.seq_type, seed=gs + i)
                    paths.append(p)
                argv = [
                    "sketch", *paths,
                    "-o", os.path.join(tmp, f"wdb{gs}"),
                    "-k", ",".join(str(k) for k in kmers),
                    "-s", str(args.sketch_size),
                    "--threads", str(args.threads),
                ]
                if args.seq_type != "dna":
                    argv += ["--seq-type", "aa", "--level", args.level]
                _run_cli(argv, f"sketch {args.seq_type} {gs:,} bases")

        dist_modes = modes & {"dense", "knn", "coreacc-dense", "coreacc-knn"}
        if dist_modes:
            n = args.db_size
            db = build_synth_db(
                os.path.join(tmp, "db"), n, args.sketch_size, kmers,
                args.seq_type, _level_num(args.level),
            )
            # first + last rank slices: full row blocks AND the tail block
            n_procs = max(1, n // _WARM_ROWS)
            ranks = [0] if n_procs == 1 else [0, n_procs - 1]
            for mode in sorted(dist_modes):
                coreacc = mode.startswith("coreacc")
                if coreacc and len(kmers) < 3:
                    print(
                        f"  skipping {mode}: needs >= 3 k-mer lengths",
                        file=sys.stderr,
                    )
                    continue
                for rank in ranks:
                    argv = ["dist", db, "-o", os.path.join(tmp, "out")]
                    if not coreacc:
                        argv += ["-k", str(kmers[0])]
                    if mode.endswith("knn"):
                        argv += ["--knn", str(args.knn)]
                    argv += [
                        "--threads", str(args.threads),
                        "--process-id", str(rank),
                        "--n-processes", str(n_procs),
                    ]
                    _run_cli(argv, f"{mode} n={n} rank {rank}/{n_procs}")
    print(
        f"warmup complete in {time.time() - total0:.0f} s — compile cache "
        "primed for this configuration",
        file=sys.stderr,
    )
    return 0


def _level_num(level) -> int:
    return int(str(level).removeprefix("level") or 1)
