"""Fast multi-k device sketching kernel for amino acids / 3Di.

The aaHash analogue of nthash_multik.py, sharing one pass over the
stream across every requested k-mer length:

1. **Incremental hashing over k.** aaHash's forward recurrence in k is
   fh_k(p) = srol(fh_{k-1}(p)) ^ SEED_level[seq[p+k-1]] (unrolling
   /root/reference/src/hashing/aahash_iterator.rs:138-210 in k instead of
   p) — simpler than the DNA case since aaHash has no reverse strand.
2. **Residual prefilter + blockwise compaction + one candidate sort**,
   identical in structure to multik_hash_bin_kernel (see nthash_multik.py
   for the derivation and why each step is exact).

Window validity for whole-sample groups is recomputed ON DEVICE from the
code stream (aahash_jax._aa_window_mask_device — invalid residues carry
compact code 20), per k; pass device_mask=True and a dummy validbits_all.
Segments of an oversized stream must instead ship their host-computed
pre-sliced global masks (one bit per (k, position)) because the
reference's final-window quirk is a whole-sequence property.

Bit-identical to the per-k aa_hash_bin_kernel whenever no fallback is
reported — asserted by tests/test_aa_device.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .aahash_jax import _aa_window_mask_device, _tap_select32_dyn
from .nthash_jax import MAX_K, _mod_mersenne61, _mul_shift, _unpack_bits
from .nthash_multik import (
    _compact_candidates,
    _sort_and_extract,
    _srol1_pair,
    _sub_pair,
)

_U32 = jnp.uint32
_I32 = jnp.int32


@functools.partial(
    jax.jit,
    static_argnames=(
        "kmers",
        "num_bins",
        "magic",
        "out_rows",
        "blk",
        "w",
        "device_mask",
        "variant",
    ),
)
def multik_aa_hash_bin_kernel(
    codes: jnp.ndarray,  # (N,) uint8 compact 5-bit aa codes, padded
    validbits_all: jnp.ndarray,  # (nk, N/8) uint8 per-k emission masks
    starts: jnp.ndarray,  # (out_rows,) int32 sample start offsets
    t_lo: jnp.ndarray,  # (out_rows,) u32 per-sample threshold low word
    t_hi: jnp.ndarray,  # (out_rows,) u32 threshold high word
    seed_row: jnp.ndarray,  # (32, 2) u32 base seed table for the level
    kmers: tuple[int, ...],  # ascending k-mer lengths (static)
    num_bins: int,
    magic: tuple[int, int],
    out_rows: int,
    blk: int,
    w: int,
    total: jnp.ndarray | None = None,  # () int32; required if device_mask
    device_mask: bool = False,
    variant: str = "taps",
):
    """Returns (min_hi, min_lo, found) each (nk, out_rows * num_bins) plus
    `overflow` () int32, with the same fallback contract as the DNA
    multik kernel (overflow > w or missing bin -> exact re-run). With
    device_mask=True, emission masks are computed on device (validbits_all
    is ignored — pass a dummy) and a fifth output `counts`
    (nk, out_rows) i32 is appended: counts[ki, i] == 0 means sample i has
    no reachable window at kmers[ki] (caller raises the set_k panic)."""
    kmax = kmers[-1]
    c = codes.astype(_I32)
    n0 = c.shape[0]
    m = n0 - MAX_K
    mm, ss = magic

    sflags = jnp.zeros(n0, dtype=_I32).at[starts].add(1, mode="drop")
    gidx = jnp.cumsum(sflags, dtype=_I32)[:m] - 1

    # per-element thresholds (one-hot select; see nthash_multik)
    tl = jnp.zeros(m, dtype=_U32)
    th = jnp.zeros(m, dtype=_U32)
    for g in range(out_rows):
        sel = gidx == g
        tl = jnp.where(sel, t_lo[g], tl)
        th = jnp.where(sel, t_hi[g], th)
    # one materialization (see nthash_multik: XLA otherwise re-fuses the
    # select chain into every k's consumer)
    tl, th = jax.lax.optimization_barrier((tl, th))

    nb_blocks = n0 // blk
    assert nb_blocks * blk == n0, (n0, blk)
    pad_tail = n0 - m

    f_lo = jnp.zeros(m, dtype=_U32)
    f_hi = jnp.zeros(m, dtype=_U32)

    if device_mask:
        valid_i32 = (c < 20).astype(_I32)
        total_i32 = total.astype(_I32)

    cand_k0 = []
    cand_hi = []
    cand_lo = []
    counts_all = []
    overflow = jnp.int32(0)

    if variant == "prefix":
        # prefix-XOR hashing (aahash_jax._windowed_hash_aa_prefix): one
        # seed select + inverse srol + XOR-scan over the stream, then each
        # k costs only two slices + a final per-position rotation — the
        # incremental step loop pays a 32-way select tree per (position,
        # step), kmax of them
        from .aahash_jax import _srol_n, _xor_prefix_scan

        q = jnp.arange(n0, dtype=jnp.uint32)
        g_lo, g_hi = _tap_select32_dyn(c, seed_row)
        r33 = (jnp.uint32(33) - q % 33) % 33
        r31 = (jnp.uint32(31) - q % 31) % 31
        g_lo, g_hi = _srol_n(g_lo, g_hi, r33, r31)
        s_lo = _xor_prefix_scan(g_lo)
        s_hi = _xor_prefix_scan(g_hi)
        p_arange = jnp.arange(m, dtype=jnp.uint32)
    elif variant == "rotsel":
        # rotate-after-select (aahash_jax._windowed_hash_aa_rotsel): the
        # incremental recurrence f_k = srol1(f_{k-1}) ^ seed[s_{p+k-1}]
        # needs one UNROTATED seed per stream position, so hoist the
        # 32-way select out of the step loop — each step then pays a
        # slice of the pre-selected stream instead of a select tree.
        # The barrier stops XLA re-fusing the tree into every consumer.
        r_lo, r_hi = _tap_select32_dyn(c, seed_row)
        r_lo, r_hi = jax.lax.optimization_barrier((r_lo, r_hi))

    for step in ((kmers if variant == "prefix" else range(1, kmax + 1))):
        if variant == "prefix":
            end_lo = jax.lax.slice(s_lo, (step - 1,), (step - 1 + m,))
            end_hi = jax.lax.slice(s_hi, (step - 1,), (step - 1 + m,))
            beg_lo = jnp.concatenate([jnp.zeros(1, _U32), s_lo[: m - 1]])
            beg_hi = jnp.concatenate([jnp.zeros(1, _U32), s_hi[: m - 1]])
            e = p_arange + jnp.uint32(step - 1)
            f_lo, f_hi = _srol_n(
                end_lo ^ beg_lo, end_hi ^ beg_hi, e % 33, e % 31
            )
        else:
            # extend every window by one residue: seq[p + step - 1]
            f_lo, f_hi = _srol1_pair(f_lo, f_hi)
            if variant == "rotsel":
                sl = jax.lax.slice(r_lo, (step - 1,), (step - 1 + m,))
                sh = jax.lax.slice(r_hi, (step - 1,), (step - 1 + m,))
            else:
                cj = jax.lax.slice(c, (step - 1,), (step - 1 + m,))
                sl, sh = _tap_select32_dyn(cj, seed_row)
            f_lo = f_lo ^ sl
            f_hi = f_hi ^ sh
            if step not in kmers:
                continue
        k_idx = kmers.index(step)
        h_lo, h_hi = _mod_mersenne61(f_lo, f_hi)

        if device_mask:
            ok, cnt = _aa_window_mask_device(
                valid_i32, starts, total_i32, jnp.int32(step), m, out_rows
            )
            counts_all.append(cnt)
        else:
            ok = _unpack_bits(validbits_all[k_idx])[:m] == 1

        # residual prefilter: keep iff sign < T or bin(sign) != bin(sign-T)
        bin_idx = _mul_shift(h_lo, h_hi, mm, ss)
        d_lo, d_hi, under = _sub_pair(h_lo, h_hi, tl, th)
        bin_shift = _mul_shift(
            jnp.where(under, _U32(0), d_lo),
            jnp.where(under, _U32(0), d_hi),
            mm,
            ss,
        )
        keep = ok & (under | (bin_idx != bin_shift))

        # blockwise monotone compaction + single sort (shared with the DNA
        # kernel: nthash_multik._compact_candidates/_sort_and_extract)
        c_k0, c_hi, c_lo, count_max = _compact_candidates(
            jnp.pad(keep, (0, pad_tail)),
            jnp.pad((_I32(k_idx) << 8) | gidx, (0, pad_tail)),
            jnp.pad(h_hi, (0, pad_tail)),
            jnp.pad(h_lo, (0, pad_tail)),
            blk,
            w,
            _I32(len(kmers)) << 8,
        )
        overflow = jnp.maximum(overflow, count_max)
        cand_k0.append(c_k0)
        cand_hi.append(c_hi)
        cand_lo.append(c_lo)

    out_hi, out_lo, found = _sort_and_extract(
        cand_k0, cand_hi, cand_lo, kmers, out_rows, num_bins, magic
    )
    if device_mask:
        return out_hi, out_lo, found, overflow, jnp.stack(counts_all)
    return out_hi, out_lo, found, overflow


def aa_seed_row_u32(level: int) -> np.ndarray:
    """Base (un-rotated) seed table for one reduced-alphabet level as a
    (32, 2) u32 [lo, hi] compact-code table — the j = k-1 tap."""
    from ..constants import aa_tap_table

    from .aahash_jax import AA_LETTERS

    tab = aa_tap_table(1, level)  # (1, 256) u64: srol^0(SEED)
    cols = np.frombuffer(AA_LETTERS, dtype=np.uint8)
    vals = tab[0, cols]  # (20,) u64
    out = np.zeros((32, 2), dtype=np.uint32)
    out[:20, 0] = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:20, 1] = (vals >> np.uint64(32)).astype(np.uint32)
    return out
