"""Non-default aaHash formulations (SKETCHTPU_AA_HASH=prefix|rotsel)
bit-exactness vs the tap path and the host oracle.

- prefix: fh(p) = srol^{k-1+p}(S(p+k-1) ^ S(p-1)) relies on srol being
  XOR-linear with independent 33/31-bit field rotations; these tests pin
  that the variable-rotation helpers and the scan reproduce the tap
  kernels exactly, including invalid residues (code 20, zero seed rows)
  and every level.
- rotsel: fh(p) = XOR_{t<k} srol^t(r_{p+k-1-t}) with r the pre-selected
  unrotated seed stream; pins the select-hoist + fixed-srol1 loop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sketchtpu.hash.aahash_jax import (
    _windowed_hash_aa,
    _windowed_hash_aa_prefix,
    _windowed_hash_aa_rotsel,
    aa_hash_bin_kernel_devmask,
    aa_tap_tables_u32,
)
from sketchtpu.hash.aahash_multik import aa_seed_row_u32
from sketchtpu.hash.nthash_jax import MAX_K


@pytest.mark.parametrize("level", [1, 2, 3])
@pytest.mark.parametrize("variant_fn", [
    _windowed_hash_aa_prefix, _windowed_hash_aa_rotsel,
])
def test_variant_hash_bit_exact_vs_taps(level, variant_fn):
    rng = np.random.default_rng(level)
    seeds = jnp.asarray(aa_seed_row_u32(level))
    for k in (3, 9, 14, 33, MAX_K):
        n = 2500
        codes = jnp.asarray(
            rng.integers(0, 21, n + MAX_K).astype(np.int32)
        )  # incl. invalid code 20
        lo1, hi1 = _windowed_hash_aa(
            codes, jnp.int32(k), jnp.asarray(aa_tap_tables_u32(k, level))
        )
        lo2, hi2 = variant_fn(codes, jnp.int32(k), seeds)
        np.testing.assert_array_equal(np.asarray(lo1), np.asarray(lo2))
        np.testing.assert_array_equal(np.asarray(hi1), np.asarray(hi2))


@pytest.mark.parametrize("variant", ["prefix", "rotsel"])
def test_variant_devmask_kernel_matches_taps_kernel(variant):
    """The full devmask binning kernel under each non-default variant
    returns the same minima/found/counts as the tap variant on a
    multi-sample stream."""
    rng = np.random.default_rng(7)
    out_rows, k, nbins = 3, 9, 32
    lens = [400, 350, 500]
    total = sum(lens)
    n_pad = total + MAX_K + (-(total + MAX_K)) % 8
    codes = np.full(n_pad, 20, dtype=np.uint8)
    pos, starts = 0, []
    for ln in lens:
        starts.append(pos)
        codes[pos : pos + ln] = rng.integers(0, 20, ln)
        pos += ln
    codes[starts[1] + 5] = 20  # an invalid residue mid-sample
    from sketchtpu.sketchcore.sketch_jax import bin_magic

    args = dict(num_bins=nbins, magic=bin_magic(nbins), out_rows=out_rows)
    starts_pad = np.asarray(starts, dtype=np.int32)
    res_t = aa_hash_bin_kernel_devmask(
        jnp.asarray(codes), starts_pad, np.int32(k),
        jnp.asarray(aa_tap_tables_u32(k, 1)), np.int32(total), **args,
    )
    res_v = aa_hash_bin_kernel_devmask(
        jnp.asarray(codes), starts_pad, np.int32(k),
        jnp.asarray(aa_seed_row_u32(1)), np.int32(total), variant=variant,
        **args,
    )
    for a, b in zip(res_t, res_v):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("variant", ["prefix", "rotsel"])
def test_variant_multik_kernel_matches_taps_kernel(variant):
    """The fused multi-k kernel under each variant returns the same
    minima/found/overflow/counts as taps (device masks, multi-sample)."""
    from sketchtpu.hash.aahash_multik import multik_aa_hash_bin_kernel
    from sketchtpu.hash.nthash_multik import group_thresholds
    from sketchtpu.sketchcore.sketch_jax import bin_magic

    rng = np.random.default_rng(11)
    out_rows, nbins = 3, 8
    kmers = (5, 9, 14)
    lens = [4200, 4096, 4800]
    total = sum(lens)
    n_pad = total + MAX_K + (-(total + MAX_K)) % 256
    codes = np.full(n_pad, 20, dtype=np.uint8)
    pos, starts = 0, []
    for ln in lens:
        starts.append(pos)
        codes[pos : pos + ln] = rng.integers(0, 20, ln)
        pos += ln
    codes[starts[2] + 9] = 20
    t_lo, t_hi, eligible, max_density = group_thresholds(
        lens + [10**12] * (out_rows - len(lens)), nbins
    )
    assert eligible
    starts_pad = np.asarray(starts, dtype=np.int32)
    dummy = np.zeros((len(kmers), 1), dtype=np.uint8)
    common = dict(
        kmers=kmers, num_bins=nbins, magic=bin_magic(nbins),
        out_rows=out_rows, blk=256, w=64,
        total=np.int32(total), device_mask=True,
    )
    res_t = multik_aa_hash_bin_kernel(
        jnp.asarray(codes), dummy, starts_pad, t_lo, t_hi,
        jnp.asarray(aa_seed_row_u32(1)), **common,
    )
    res_v = multik_aa_hash_bin_kernel(
        jnp.asarray(codes), dummy, starts_pad, t_lo, t_hi,
        jnp.asarray(aa_seed_row_u32(1)), variant=variant, **common,
    )
    for a, b in zip(res_t, res_v):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
