"""Prefix-XOR aaHash (SKETCHTPU_AA_HASH=prefix) bit-exactness vs the tap
path and the host oracle. The prefix formulation
fh(p) = srol^{k-1+p}(S(p+k-1) ^ S(p-1)) relies on srol being XOR-linear
with independent 33/31-bit field rotations; these tests pin that the
variable-rotation helpers and the scan reproduce the tap kernels exactly,
including invalid residues (code 20, zero seed rows) and every level."""

import numpy as np
import pytest

import jax.numpy as jnp

from sketchtpu.hash.aahash_jax import (
    _windowed_hash_aa,
    _windowed_hash_aa_prefix,
    aa_hash_bin_kernel_devmask,
    aa_tap_tables_u32,
)
from sketchtpu.hash.aahash_multik import aa_seed_row_u32
from sketchtpu.hash.nthash_jax import MAX_K


@pytest.mark.parametrize("level", [1, 2, 3])
def test_prefix_hash_bit_exact_vs_taps(level):
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
        lo2, hi2 = _windowed_hash_aa_prefix(codes, jnp.int32(k), seeds)
        np.testing.assert_array_equal(np.asarray(lo1), np.asarray(lo2))
        np.testing.assert_array_equal(np.asarray(hi1), np.asarray(hi2))


def test_prefix_devmask_kernel_matches_taps_kernel():
    """The full devmask binning kernel under prefix=True returns the same
    minima/found/counts as the tap variant on a multi-sample stream."""
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
    res_p = aa_hash_bin_kernel_devmask(
        jnp.asarray(codes), starts_pad, np.int32(k),
        jnp.asarray(aa_seed_row_u32(1)), np.int32(total), prefix=True,
        **args,
    )
    for a, b in zip(res_t, res_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
