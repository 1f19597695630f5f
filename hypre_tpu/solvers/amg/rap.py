"""Galerkin coarse operator RAP.

Reference: parcsr_ls/par_rap.c hypre_BoomerAMGBuildCoarseOperator
(A_H = P^T A P with R = P^T, the hypre default) — the setup hot spot.

Host design: scipy's CSR SpGEMM (C++ SMMP under the hood) is the
two-pass row-count+fill algorithm hypre uses (csr_matop.c:296); per
SURVEY §7, setup runs host-side at hierarchy-build time.  hypre keeps
numerically-cancelled zeros in the product; scipy's matmul likewise does
not drop stored zeros, so operator-complexity stats are comparable.
"""

from __future__ import annotations

import scipy.sparse as sp


def galerkin_rap(A: sp.csr_matrix, P: sp.csr_matrix) -> sp.csr_matrix:
    AP = A @ P
    RAP = P.T.tocsr() @ AP
    RAP.sort_indices()
    return RAP.tocsr()


def nongalerkin_filter(A: sp.csr_matrix, tol: float,
                       lump: str = "diag") -> sp.csr_matrix:
    """Sparsify a coarse operator (parcsr_ls/par_nongalerkin.c role).

    Drops |a_ij| < tol * sqrt(|a_ii a_jj|) (symmetrized) and lumps the
    dropped mass so row sums are preserved (constants — the near-null
    space of M-matrices — stay exactly interpolated).  lump="diag" puts
    dropped mass on the diagonal (SPD-safe); lump="strong" redistributes
    it over the row's KEPT off-diagonal entries proportionally to their
    magnitudes (the reference's neighbor redistribution,
    par_nongalerkin.c), which tolerates much larger drop tolerances.
    """
    import numpy as np

    if tol <= 0:
        return A
    A = A.tocsr()
    A.sort_indices()
    from ... import native

    out = native.nongalerkin_filter_native(A, tol, lump)
    if out is not None:
        return out
    n = A.shape[0]
    d = np.sqrt(np.abs(A.diagonal()))
    d[d == 0] = 1.0
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    cols = A.indices
    small = np.abs(A.data) < tol * d[rows] * d[cols]
    keep = ~small | (rows == cols)

    # symmetrize the drop pattern to preserve symmetry: keep (i,j) if
    # (j,i) is kept.  When the PATTERN is symmetric (canonical CSR of a
    # Galerkin RAP of a symmetric A), the CSC view of A is entrywise
    # aligned with the CSR of A^T sharing indptr/indices — the transpose
    # permutation comes from one scipy conversion, no 64-bit key sort.
    AT = A.T.tocsr()
    AT.sort_indices()
    if AT.indptr.shape == A.indptr.shape and np.array_equal(
        AT.indptr, A.indptr
    ) and np.array_equal(AT.indices, A.indices):
        smallT = np.abs(AT.data) < tol * d[rows] * d[cols]
        keep = keep | ~smallT  # (j,i) kept at the aligned entry
    else:  # nonsymmetric pattern: sorted-key search (rare path)
        key = rows * n + cols
        keyT = cols.astype(np.int64) * n + rows
        kept_sorted = np.sort(key[keep])
        posT = np.searchsorted(kept_sorted, keyT)
        posT = np.clip(posT, 0, max(len(kept_sorted) - 1, 0))
        kept_T = (len(kept_sorted) > 0) & (kept_sorted[posT] == keyT)
        keep = keep | kept_T

    return _lump_and_rebuild(A, keep, rows, cols, lump)


def _lump_and_rebuild(A, keep, rows, cols, lump: str) -> sp.csr_matrix:
    """Drop entries where ~keep, lumping the dropped mass so row sums
    are preserved ("diag" onto the diagonal, "strong" over the row's
    kept off-diagonals by |value| — par_nongalerkin.c's neighbor
    redistribution), then rebuild canonical CSR."""
    import numpy as np

    n = A.shape[0]
    dropped = ~keep
    dropped_sum = np.bincount(
        rows[dropped], weights=A.data[dropped], minlength=n
    ).astype(A.data.dtype)
    redist_data = A.data.copy()
    if lump == "strong":
        # distribute each row's dropped mass over its kept off-diagonal
        # entries, weighted by |value| (rows with none fall back to the
        # diagonal via dropped_sum)
        keep_off = keep & (rows != cols)
        wsum = np.bincount(
            rows[keep_off], weights=np.abs(A.data[keep_off]), minlength=n
        )
        has = wsum > 0
        frac = np.zeros_like(redist_data)
        frac[keep_off] = np.abs(A.data[keep_off]) / wsum[rows[keep_off]]
        add = dropped_sum[rows] * frac
        mask_rows = has[rows] & keep_off
        redist_data = np.where(mask_rows, redist_data + add, redist_data)
        dropped_sum = np.where(has, 0.0, dropped_sum)
    # rebuild CSR in place of the kept entries (rows stay sorted)
    new_indptr = np.zeros(n + 1, dtype=A.indptr.dtype)
    kept_per_row = np.add.reduceat(
        keep.astype(np.int64), np.minimum(A.indptr[:-1], max(A.nnz - 1, 0))
    ) * (np.diff(A.indptr) > 0)
    np.cumsum(kept_per_row, out=new_indptr[1:])
    out = sp.csr_matrix(
        (redist_data[keep], cols[keep], new_indptr), shape=A.shape
    )
    out = out + sp.diags(dropped_sum)
    out.sort_indices()
    return out.tocsr()


def offset_budget_filter(
    A: sp.csr_matrix, pos, budget: int, lump: str = "strong"
) -> sp.csr_matrix:
    """Sparsify a RELOCATED coarse operator to its `budget` heaviest
    lattice diagonals.

    The lattice-relocated DIA form of a deep Galerkin operator stores
    noffs x ncells where noffs is the number of DISTINCT embedded
    offsets pos[j] - pos[i] — observed 661/883 at 96^3 levels 2/3,
    i.e. 25-120x the true nnz content, and the dominant HBM cost of the
    whole V-cycle.  This filter keeps entries on the `budget` offsets
    carrying the most |value| mass (in symmetric +/- pairs, diagonal
    always kept) and lumps dropped mass row-sum-preservingly — the
    par_nongalerkin.c sparsification rationale (Falgout-Schroder) with
    offset-rarity as the drop criterion instead of magnitude.  Applied
    to the SOLVE-phase operator only; the host hierarchy (and the
    coarser Galerkin products built from it) is untouched.
    """
    import numpy as np

    A = A.tocsr()
    A.sort_indices()
    n = A.shape[0]
    pos = np.asarray(pos, dtype=np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    cols = A.indices
    offs = pos[cols] - pos[rows]
    uoff, inv = np.unique(offs, return_inverse=True)
    if budget <= 0 or len(uoff) <= budget:
        return A
    mass = np.bincount(inv, weights=np.abs(A.data))
    # pair mass: an offset and its negative are kept or dropped together
    neg = np.searchsorted(uoff, -uoff)
    has_neg = (neg < len(uoff)) & (uoff[np.minimum(neg, len(uoff) - 1)] == -uoff)
    pair_mass = mass + np.where(has_neg, mass[np.minimum(neg, len(uoff) - 1)], 0.0)
    order = np.argsort(-pair_mass, kind="stable")
    kept = np.zeros(len(uoff), dtype=bool)
    zero_at = np.searchsorted(uoff, 0)
    count = 0
    if zero_at < len(uoff) and uoff[zero_at] == 0:
        kept[zero_at] = True
        count = 1
    for oi in order:
        if count >= budget:
            break
        if kept[oi]:
            continue
        kept[oi] = True
        count += 1
        if has_neg[oi] and not kept[neg[oi]]:
            kept[neg[oi]] = True
            count += 1
    keep = kept[inv] | (rows == cols)
    return _lump_and_rebuild(A, keep, rows, cols, lump)
