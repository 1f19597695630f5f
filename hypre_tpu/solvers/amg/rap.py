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


def nongalerkin_filter(A: sp.csr_matrix, tol: float) -> sp.csr_matrix:
    """Sparsify a coarse operator (parcsr_ls/par_nongalerkin.c role).

    Drops |a_ij| < tol * sqrt(|a_ii a_jj|) (symmetrized) and lumps the
    dropped mass onto the diagonal, preserving row sums (so constants —
    the near-null space of M-matrices — stay exactly interpolated).
    The reference redistributes onto strong neighbors; diagonal lumping
    is the simpler SPD-safe variant.
    """
    import numpy as np

    if tol <= 0:
        return A
    A = A.tocsr()
    n = A.shape[0]
    d = np.sqrt(np.abs(A.diagonal()))
    d[d == 0] = 1.0
    Ac = A.tocoo()
    small = np.abs(Ac.data) < tol * d[Ac.row] * d[Ac.col]
    keep = ~small | (Ac.row == Ac.col)
    # symmetrize the drop pattern to preserve symmetry
    key = Ac.row.astype(np.int64) * n + Ac.col
    keyT = Ac.col.astype(np.int64) * n + Ac.row
    order = np.argsort(key)
    kept_sorted = np.sort(key[keep])
    posT = np.searchsorted(kept_sorted, keyT)
    posT = np.clip(posT, 0, max(len(kept_sorted) - 1, 0))
    kept_T = (len(kept_sorted) > 0) & (kept_sorted[posT] == keyT)
    keep = keep | kept_T
    dropped_sum = np.zeros(n)
    np.add.at(dropped_sum, Ac.row[~keep], Ac.data[~keep])
    out = sp.coo_matrix(
        (Ac.data[keep], (Ac.row[keep], Ac.col[keep])), shape=A.shape
    ).tocsr()
    out = out + sp.diags(dropped_sum)
    out.sort_indices()
    return out.tocsr()
