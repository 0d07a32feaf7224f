"""Distance output formatting.

Matches Rust's `Display` for f32 (shortest decimal string that round-trips,
positional notation, no trailing ".0") and the long-form / sparse layouts of
/root/reference/src/distances/distance_matrix.rs:175-209,360-401.
"""

from __future__ import annotations

import numpy as np


def fmt_f32(value) -> str:
    """Format a float32 like Rust's `{}` (shortest round-trip, positional)."""
    v = np.float32(value)
    if np.isnan(v):
        return "NaN"
    if np.isinf(v):
        return "inf" if v > 0 else "-inf"
    return np.format_float_positional(v, unique=True, trim="-")


def fmt_f32_column(values: np.ndarray) -> list[str]:
    return [fmt_f32(v) for v in np.asarray(values, dtype=np.float32)]


def write_dense_self(out, names, dists, coreacc: bool):
    """Upper-triangle long form. dists: (n_pairs,) or (n_pairs, 2)."""
    n = len(names)
    idx = 0
    if coreacc:
        for i in range(n):
            for j in range(i + 1, n):
                out.write(
                    f"{names[i]}\t{names[j]}\t"
                    f"{fmt_f32(dists[idx, 0])}\t{fmt_f32(dists[idx, 1])}\n"
                )
                idx += 1
    else:
        for i in range(n):
            for j in range(i + 1, n):
                out.write(f"{names[i]}\t{names[j]}\t{fmt_f32(dists[idx])}\n")
                idx += 1


def write_dense_cross(out, ref_names, query_names, dists, coreacc: bool):
    """Rectangular long form, ref-major."""
    idx = 0
    if coreacc:
        for rn in ref_names:
            for qn in query_names:
                out.write(
                    f"{rn}\t{qn}\t{fmt_f32(dists[idx, 0])}\t"
                    f"{fmt_f32(dists[idx, 1])}\n"
                )
                idx += 1
    else:
        for rn in ref_names:
            for qn in query_names:
                out.write(f"{rn}\t{qn}\t{fmt_f32(dists[idx])}\n")
                idx += 1


def write_sparse(out, row_names, ref_names, rows, coreacc: bool):
    """Sparse kNN output; rows is a list (per row) of item lists.

    Jaccard items: (ref_idx, dist_f32); padding entries (dist == 1.0 and
    col == row) are skipped at print (distance_matrix.rs:377-380).
    CoreAcc items: (ref_idx, core_f32, acc_f32) — never skipped.
    """
    if coreacc:
        for row_name, items in zip(row_names, rows):
            for ref_idx, core, acc in items:
                out.write(
                    f"{row_name}\t{ref_names[ref_idx]}\t"
                    f"{fmt_f32(core)}\t{fmt_f32(acc)}\n"
                )
    else:
        for row_name, items in zip(row_names, rows):
            for ref_idx, dist in items:
                col_name = ref_names[ref_idx]
                if np.float32(dist) < np.float32(1.0) or col_name != row_name:
                    out.write(f"{row_name}\t{col_name}\t{fmt_f32(dist)}\n")
