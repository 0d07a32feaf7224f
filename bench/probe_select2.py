"""Round-3 follow-up selection experiments (after the 512x512 geometry win).

State (probe_knn_gap, 512x512 kernel blocks, chip idle, RTT-cancelled):
  raw 3.54 / v1 full 2.78 / v2 2.33 / masked(XLA) 2.30 / masked2(kernel) 1.16
v2 (keys kernel + group-max merge + deferred gather) LOSES to v1; the
in-kernel S=100 mask loop is catastrophically slow under Mosaic. Remaining
candidates measured here:

  g16    : v1 scan with merge group g=16 (narrower top_k, wider gather)
  mxu    : v1 scan with the shrink's take_along_axis group gather replaced
           by an exact bf16 one-hot matmul (values split into 2 small-int
           limbs, 0/1 one-hot and limbs exact in bf16)
  maskbp : XLA sign-equality mask via 16 bit-planes over packed u32 words
           (132 ops/pair) instead of the S-wide i32 equality (200 ops/pair)
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketchtpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from sketchtpu.dist.knn_jax import _NEG, _pack_shift  # noqa: E402
from sketchtpu.dist.pallas_kernels import (  # noqa: E402
    chunk_group_major,
    samebits_pallas_chunked,
)

S64, TR, NB, TC, KNN = 16, 2048, 65536, 8192, 50
W2 = S64 * 14 * 2


def _time_chain(fn, inner=5):
    float(fn(jnp.uint32(0), 1))
    float(fn(jnp.uint32(0), inner))
    best = float("inf")
    for t in range(2):
        t0 = time.perf_counter()
        float(fn(jnp.uint32(1 + t), 1))
        t1 = time.perf_counter()
        float(fn(jnp.uint32(64 + t), inner))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (inner - 1))
    return best


def _shrink(sb, knn, g, gather):
    """_tile_topk_reduce with selectable gather implementation."""
    tr, tc = sb.shape
    ng = tc // g
    k3 = sb.reshape(tr, ng, g)
    gm = k3.max(axis=2)
    _, gsel = jax.lax.top_k(gm, knn)
    gsel = jnp.sort(gsel, axis=1)
    if gather == "take":
        keys_r = jnp.take_along_axis(k3, gsel[:, :, None], axis=1)
    else:  # exact bf16 one-hot matmul: v' = max(v, -1) + 1 in [0, 1025],
        # limbs v' & 63 and v' >> 6 both <= 63 (exact in bf16)
        vp = jnp.maximum(k3, -1) + 1
        lo = (vp & 63).astype(jnp.bfloat16)
        hi = (vp >> 6).astype(jnp.bfloat16)
        onehot = (
            gsel[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, ng), 2
            )
        ).astype(jnp.bfloat16)
        glo = jnp.einsum(
            "rkg,rgw->rkw", onehot, lo,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        ghi = jnp.einsum(
            "rkg,rgw->rkw", onehot, hi,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        keys_r = ((ghi << 6) | glo) - 1
    loc = gsel[:, :, None] * g + jax.lax.broadcasted_iota(
        gsel.dtype, (tr, knn, g), 2
    )
    return keys_r.reshape(tr, knn * g), loc.reshape(tr, knn * g)


def scan_mode(mode: str):
    a = jax.random.bits(jax.random.PRNGKey(0), (TR, W2), dtype=jnp.uint32)
    b = jax.random.bits(jax.random.PRNGKey(1), (NB, W2), dtype=jnp.uint32)
    a_cm = chunk_group_major(a, S64)
    bt_cm = chunk_group_major(b, S64).T.copy()
    shift = _pack_shift(S64)
    colmask = (1 << shift) - 1
    g = 16 if mode == "g16" else 8

    @functools.partial(jax.jit, static_argnames=("inner",))
    def chain(salt, inner):
        def body(_, s):
            init = jnp.full((TR, KNN), -1, jnp.int32)

            def tile_body(carry, t):
                c0 = t * TC
                bt = jax.lax.dynamic_slice(bt_cm, (0, c0), (bt_cm.shape[0], TC))
                sb = samebits_pallas_chunked(a_cm ^ s, bt, S64)
                gather = "mxu" if mode == "mxu" else "take"
                sb_s, loc = _shrink(sb, KNN, g, gather)
                packed = (sb_s << shift) | (colmask - (c0 + loc))
                packed = jnp.where(sb_s < 0, -1, packed)
                cat = jnp.concatenate([carry, packed], axis=1)
                merged, _ = jax.lax.top_k(cat, KNN)
                return merged, None

            carry, _ = jax.lax.scan(
                tile_body, init, jnp.arange(NB // TC, dtype=jnp.int32)
            )
            return (carry.sum().astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0

        return jax.lax.fori_loop(0, inner, body, salt)

    dt = _time_chain(chain)
    pairs = TR * NB
    print(f"{mode:7s}: {dt*1e3:8.2f} ms/block -> {pairs/dt/1e9:5.2f} G pair/s,"
          f" {dt*1e3/(NB//TC):6.2f} ms/tile")


def maskbp():
    """Bit-plane vs i32-equality sign mask, standalone on the scan shape."""
    S = 100
    a_sig = jax.random.randint(
        jax.random.PRNGKey(2), (TR, S), 0, 1 << 16, dtype=jnp.int32
    )
    b_sig = jax.random.randint(
        jax.random.PRNGKey(3), (NB, S), 0, 1 << 16, dtype=jnp.int32
    )

    # packed bit-planes: 16 planes x ceil(S/32) u32 words per sample
    def plane_pack(sig):
        n, s = sig.shape
        w = -(-s // 32)
        bits = (sig[:, None, :] >> jnp.arange(16, dtype=jnp.int32)[None, :, None]) & 1
        pad = w * 32 - s
        bits = jnp.pad(bits, ((0, 0), (0, 0), (0, pad)))
        bits = bits.reshape(n, 16, w, 32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        return (bits.astype(jnp.uint32) * weights).sum(axis=3, dtype=jnp.uint32)

    ap = plane_pack(a_sig)  # (TR, 16, W)
    bp = plane_pack(b_sig)  # (NB, 16, W)
    wpad = ap.shape[2] * 32 - S
    # padded tail bins: both sides zero -> equal -> spurious shared! mask
    # the tail word bits out of the final AND
    tailmask = jnp.uint32((1 << (32 - wpad)) - 1) if wpad else jnp.uint32(-1)

    @functools.partial(jax.jit, static_argnames=("inner", "mode"))
    def chain(salt, inner, mode):
        def body(_, s):
            def tile_body(c, t):
                c0 = t * TC
                if mode == "i32":
                    st = jax.lax.dynamic_slice(b_sig, (c0, 0), (TC, S))
                    shared = ((a_sig ^ (s & 1).astype(jnp.int32))[:, None, :]
                              == st[None, :, :]).any(axis=2)
                else:
                    st = jax.lax.dynamic_slice(
                        bp, (c0, 0, 0), (TC, 16, bp.shape[2])
                    )
                    av = ap ^ (s & 1).astype(jnp.uint32)
                    acc = jnp.full(
                        (TR, TC, ap.shape[2]), 0xFFFFFFFF, jnp.uint32
                    )
                    for p in range(16):
                        acc = acc & ~(av[:, None, p, :] ^ st[None, :, p, :])
                    acc = acc.at[:, :, -1].set(acc[:, :, -1] & tailmask)
                    shared = (acc != 0).any(axis=2)
                return c ^ shared.sum().astype(jnp.int32), None

            r, _ = jax.lax.scan(
                tile_body, jnp.int32(0), jnp.arange(NB // TC, dtype=jnp.int32)
            )
            return (r.astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0

        return jax.lax.fori_loop(0, inner, body, salt)

    for mode in ("i32", "bp"):
        dt = _time_chain(lambda s, n, m=mode: chain(s, n, m))
        pairs = TR * NB
        print(f"mask-{mode:4s}: {dt*1e3:8.2f} ms/block -> "
              f"{pairs/dt/1e9:5.2f} G pair/s, {dt*1e3/(NB//TC):6.2f} ms/tile")


if __name__ == "__main__":
    which = sys.argv[1:] or ["mxu", "g16", "maskbp"]
    for m in which:
        if m == "maskbp":
            maskbp()
        else:
            scan_mode(m)
