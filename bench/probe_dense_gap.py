"""Decompose the dense single-k full-schedule gap (VERDICT r4 weak #2 /
task 2): round 4 measured the 100k schedule at 3.31 G pair/s sustained vs
4.87 isolated-tile (reduce-only) and 3.80 (materializing Pallas tile
standalone), and attributed the gap to "the strip kernel's materialized
int32 output + dynamic-slice + scan overhead" WITHOUT measuring. This
probe measures each term at schedule granularity, on the real 100k shape
(n=102,400 = 50 x 2048-row strips), checksum sink, best-of-3 salted,
chip idle:

  r4_scan_strip  the round-4 production schedule: per strip, a lax.scan
                 over 50 x 2048-column tiles, each a Pallas int32 tile
                 materialized to HBM, cast to int16, stacked, then a
                 transposing reshape to (blk, n).
  scan_tilesum   same scan, but each Pallas tile is reduced to a scalar
                 immediately (no int16 cast, no stacking, no transpose):
                 isolates the kernel + dynamic-slice + scan/cond term.
  fused          ONE pallas_call per strip (pallas_kernels.
                 samebits_strip_fused): grid over (row blocks x column
                 blocks x chunk groups), int32 VMEM accumulator, int16
                 strip written once in final layout, tri-skip at
                 (512,512) block granularity inside the kernel.

Rates normalise by the pairs each variant's tri granularity actually
computes; the implied exact-100k triangle wall is derived from each
variant's pair rate. Whichever materializing variant wins is promoted
into jaccard_jax._samebits_strip_pallas (the production strip).
"""

import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketchtpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from sketchtpu.dist.jaccard_jax import _samebits_strip_pallas  # noqa: E402
from sketchtpu.dist.pallas_kernels import (  # noqa: E402
    chunk_group_major,
    samebits_pallas_chunked,
    samebits_strip_fused,
)

S64 = 16
TILE = 2048  # DeviceDenseStreamEngine row-block tile
N = int(os.environ.get("PROBE_N_BLOCKS", "50")) * TILE
N_REF = 100_000
INTERP = os.environ.get("PROBE_INTERPRET") == "1"  # CPU smoke only


def tri_pairs(n: int, ti: int, tj: int, tile: int) -> int:
    total = 0
    for r0 in range(0, n, tile):
        for bi in range(tile // ti):
            row_min = r0 + bi * ti
            for j in range(n // tj):
                if not ((j + 1) * tj - 1 <= row_min):
                    total += ti * tj
    return total


def main():
    which = set(sys.argv[1:] or ["r4_scan_strip", "scan_tilesum", "fused"])
    mat = jax.random.bits(
        jax.random.PRNGKey(1), (N, S64 * 28), dtype=jnp.uint32
    )
    cm = chunk_group_major(mat, S64)
    cm_t = jnp.transpose(cm)
    cm.block_until_ready()
    del mat

    @functools.partial(jax.jit, static_argnames=("nblk", "variant"))
    def schedule(salt, nblk, variant, cm=None, cm_t=None):
        def body(carry, bi):
            r0 = bi * TILE
            a_blk = (
                jax.lax.dynamic_slice(cm, (r0, 0), (TILE, cm.shape[1]))
                ^ salt
            )
            if variant == "r4_scan_strip":
                strip = _samebits_strip_pallas(
                    a_blk, cm_t, S64, TILE, r0, tri=True, interpret=INTERP
                )
                return carry + strip.sum(dtype=jnp.int32), None
            if variant == "scan_tilesum":
                def tile(j0):
                    bt = jax.lax.dynamic_slice(
                        cm_t, (0, j0), (cm_t.shape[0], TILE)
                    )
                    return samebits_pallas_chunked(
                        a_blk, bt, S64, interpret=INTERP
                    ).sum(dtype=jnp.int32)

                def tbody(tcarry, t):
                    j0 = t * TILE
                    out = jax.lax.cond(
                        j0 + TILE > r0,
                        tile,
                        lambda _: jnp.int32(0),
                        j0,
                    )
                    return tcarry + out, None

                cs, _ = jax.lax.scan(
                    tbody, jnp.int32(0),
                    jnp.arange(N // TILE, dtype=jnp.int32),
                )
                return carry + cs, None
            # fused
            strip = samebits_strip_fused(
                a_blk, cm_t, S64, row0=r0, tri=True, interpret=INTERP
            )
            return carry + strip.astype(jnp.int32).sum(), None

        cs, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(nblk, dtype=jnp.int32)
        )
        return cs

    results = {}
    for variant in ("r4_scan_strip", "scan_tilesum", "fused"):
        if variant not in which:
            continue
        # r4/scan_tilesum skip at strip x 2048-col granularity; fused
        # skips at (512, 512) blocks
        if variant == "fused":
            pairs = tri_pairs(N, 512, 512, TILE)
        else:
            pairs = tri_pairs(N, TILE, TILE, TILE)
        float(schedule(jnp.uint32(0), 1, variant, cm, cm_t))
        float(schedule(jnp.uint32(0), N // TILE, variant, cm, cm_t))
        best, trials = float("inf"), []
        for t in range(3):
            t0 = time.perf_counter()
            float(schedule(jnp.uint32(1 + t), 1, variant, cm, cm_t))
            t1 = time.perf_counter()
            float(
                schedule(jnp.uint32(64 + t), N // TILE, variant, cm, cm_t)
            )
            t2 = time.perf_counter()
            trials.append(round(t2 - t1, 3))
            print(
                f"  {variant} trial {t}: full {t2-t1:.2f} s, "
                f"1-block {t1-t0:.2f} s",
                flush=True,
            )
            best = min(best, t2 - t1)
        rate = pairs / best
        implied_100k = N_REF * (N_REF - 1) / 2 / rate
        results[variant] = {
            "trials_full_s": trials,
            "best_full_s": round(best, 3),
            "computed_pairs": pairs,
            "rate_gpairs_s": round(rate / 1e9, 3),
            "implied_100k_s": round(implied_100k, 2),
        }
        print(
            f"{variant}: n={N} best {best:.2f} s for {pairs/1e9:.2f} G "
            f"computed pairs -> {rate/1e9:.2f} G pair/s sustained; "
            f"implied exact-100k triangle {implied_100k:.1f} s",
            flush=True,
        )

    art = pathlib.Path(__file__).resolve().parent / "artifacts"
    art.mkdir(exist_ok=True)
    payload = {
        "probe": "bench/probe_dense_gap.py",
        "shape": f"n={N}, s64={S64}, single k, {TILE}-row strips, "
        "tri skip, checksum sink",
        "protocol": "best-of-3 salted full-schedule walls; the 1-block "
        "schedule time is recorded for context only (rates are computed "
        "from the raw full-schedule wall, so they are conservative by "
        "the dispatch overhead)",
        "variants": results,
    }
    with open(art / "dense_gap_r5.json", "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(f"artifact -> {art / 'dense_gap_r5.json'}")


if __name__ == "__main__":
    main()
