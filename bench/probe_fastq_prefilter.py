"""Measured transfer reduction of the FASTQ consult-superset prefilter
(sketchcore/sign_prefilter.py) at the 25 Mb @ 25x coverage bench shape.

The old reads path ships the full in-order sign stream (8 B/base/k); the
prefilter ships `cap` words (m/4) of which `count` are real survivors.
This probe builds one dispatch-window-sized read stream from a 25x-coverage
simulation (150 bp reads off a random 640 kb genome -> 16M bases, the
_SEG_BASES window), runs the production dispatch/collect pair, and reports
the kept fraction + bit-identity of the binned result vs the full path.
"""

import json
import pathlib
import sys
import time

ART = pathlib.Path(__file__).resolve().parent / "artifacts"


def _write_artifact(name, payload):
    ART.mkdir(exist_ok=True)
    path = ART / name
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(f"artifact -> {path}", flush=True)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from sketchtpu.ingest.fastx import DnaStream  # noqa: E402
from sketchtpu.sketchcore.signs import bin_minima_filtered  # noqa: E402
from sketchtpu.sketchcore.sketch_jax import (  # noqa: E402
    _SEG_BASES,
    DeviceSketchBackend,
)


def make_reads(coverage=25, read_len=150, total=None, seed=0):
    rng = np.random.default_rng(seed)
    total = total or (_SEG_BASES - 4096)
    glen = total // coverage
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    n_reads = total // read_len
    starts = rng.integers(0, glen - read_len, n_reads)
    codes = np.empty(n_reads * read_len, dtype=np.uint8)
    breaks = np.arange(1, n_reads, dtype=np.int64) * read_len
    for i, s in enumerate(starts):
        seg = genome[s : s + read_len]
        if i % 2:  # reverse-complement half the reads
            seg = 3 - seg[::-1]
        codes[i * read_len : (i + 1) * read_len] = seg
    # ~0.5% uniform errors (sequencer-like)
    err = rng.random(codes.size) < 0.005
    codes[err] = (codes[err] + rng.integers(1, 4, int(err.sum()))) % 4
    return DnaStream(
        codes=codes, breaks=breaks,
        acgt=np.array([1, 1, 1, 1], dtype=np.int64), reads=True,
    )


def write_fastq_gz(path, total, read_len=150, coverage=25, seed=0):
    """Synthetic FASTQ sample: `total` bases of `read_len` reads at
    `coverage`x off one random genome, ~0.5% errors, Q40 throughout."""
    import gzip

    rng = np.random.default_rng(seed)
    glen = total // coverage
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_reads = total // read_len
    qual = b"I" * read_len
    with gzip.open(path, "wb", compresslevel=1) as f:
        for i, s in enumerate(rng.integers(0, glen - read_len, n_reads)):
            seg = genome[s : s + read_len]
            if i % 2:
                seg = 3 - seg[::-1]
            err = rng.random(read_len) < 0.005
            if err.any():
                seg = seg.copy()
                seg[err] = (seg[err] + rng.integers(1, 4, int(err.sum()))) % 4
            f.write(
                b"@r%d\n%s\n+\n%s\n"
                % (i, letters[seg].tobytes(), qual)
            )


def e2e():
    """2-sample CLI `sketch` wall, prefilter on vs off, byte-identical
    .skd asserted (the VERDICT round-3 task-4 shape: 25 Mb @ 25x,
    k=17, min_count=5)."""
    import os
    import subprocess
    import tempfile

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    with tempfile.TemporaryDirectory(prefix="pf_e2e_") as tmp:
        rfile = os.path.join(tmp, "rfile.txt")
        with open(rfile, "w") as rf:
            for s in range(2):
                fq = os.path.join(tmp, f"s{s}.fastq.gz")
                print(f"writing s{s}.fastq.gz (25 Mb @ 25x)...", flush=True)
                write_fastq_gz(fq, 25_000_000, seed=s)
                rf.write(f"s{s}\t{fq}\n")
        walls = {}
        for pf in ("1", "0"):
            env = dict(os.environ, SKETCHTPU_FASTQ_PREFILTER=pf)
            t0 = time.time()
            subprocess.run(
                [
                    sys.executable, "-m", "sketchtpu.cli", "sketch",
                    "-f", rfile, "-o", os.path.join(tmp, f"db{pf}"),
                    "-k", "17", "--min-count", "5", "--quiet",
                ],
                cwd=repo, env=env, check=True,
            )
            walls[pf] = time.time() - t0
            print(f"prefilter={pf}: {walls[pf]:.1f} s CLI wall", flush=True)
        with open(os.path.join(tmp, "db1.skd"), "rb") as f1, open(
            os.path.join(tmp, "db0.skd"), "rb"
        ) as f0:
            same = f1.read() == f0.read()
        print(
            f"e2e 2 x 25Mb @ 25x: prefilter ON {walls['1']:.1f} s / "
            f"OFF {walls['0']:.1f} s ({walls['0']/walls['1']:.2f}x); "
            f".skd byte-identical: {same}"
        )
        _write_artifact(
            "fastq_prefilter_e2e_r5.json",
            {
                "probe": "bench/probe_fastq_prefilter.py e2e",
                "shape": "2 samples x 25 Mb @ 25x, 150 bp reads, "
                "~0.5% errors, Q40, k=17, min_count=5",
                "wall_on_s": round(walls["1"], 1),
                "wall_off_s": round(walls["0"], 1),
                "speedup_x": round(walls["0"] / walls["1"], 2),
                "skd_byte_identical": same,
                "note": "CLI walls on this rig (1 host core + tunneled "
                "TPU); the prefilter cuts the device->host sign stream, "
                "which crosses the 0.3-33 MB/s tunnel here but a "
                "~10 GB/s PCIe link in production.",
            },
        )
        assert same


def main():
    if "e2e" in sys.argv[1:]:
        e2e()
        return
    k, nbins, min_count = 17, 1024, 5
    be = DeviceSketchBackend()
    stream = make_reads()
    m_bases = stream.seq_len / 1e6

    t0 = time.time()
    h = be.dispatch_signs_maybe_filtered(stream, k, True, nbins, min_count)
    kind = h[0]
    assert kind == "pf", kind
    c_lo, c_hi, count = h[5]
    cap = h[6]
    count = int(count)
    t_pf = time.time() - t0
    m = int(h[4][0].shape[0])
    print(
        f"{m_bases:.1f} Mb reads, k={k}, min_count={min_count}: "
        f"windows={m/1e6:.1f}M, survivors={count/1e6:.3f}M "
        f"({100*count/m:.2f}% kept -> {m/max(count,1):.0f}x transfer cut; "
        f"cap {cap/1e6:.1f}M), prefilter+dispatch {t_pf:.1f} s"
    )

    surv = be.collect_signs_maybe_filtered(h)
    bins_pf = bin_minima_filtered(surv, nbins, min_count)
    full = be.signs_in_order(stream, k, True)
    bins_full = bin_minima_filtered(full, nbins, min_count)
    same = np.array_equal(bins_pf, bins_full)
    print(f"bit-identical bins vs full-stream replay: {same}")
    _write_artifact(
        "fastq_prefilter_window_r5.json",
        {
            "probe": "bench/probe_fastq_prefilter.py (window mode)",
            "shape": f"{m_bases:.1f} Mb of 150 bp reads @ 25x, k={k}, "
            f"min_count={min_count}, {nbins} bins (one _SEG_BASES "
            "dispatch window)",
            "windows": m,
            "survivors": count,
            "kept_fraction": round(count / m, 6),
            "transfer_cut_x": round(m / max(count, 1), 1),
            "cap_words": int(cap),
            "cap_cut_x": round(m / cap, 2),
            "bins_bit_identical": same,
            "note": "survivors = signs the host bloom/count filter must "
            "still consult; shipped bytes = cap words (padded stream) "
            "vs m words for the full path.",
        },
    )
    assert same


if __name__ == "__main__":
    main()
