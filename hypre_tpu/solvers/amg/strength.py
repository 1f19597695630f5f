"""Strength-of-connection graph S.

Reference: parcsr_ls/par_strength.c hypre_BoomerAMGCreateSHost — classical
definition (comment at par_coarsen.c:2100-2110):

  i depends on j  iff  a_ij < theta * min_{k != i} a_ik     (a_ii >= 0)
                  iff  a_ij > theta * max_{k != i} a_ik     (a_ii <  0)

plus the max_row_sum test: if |row_sum| > |a_ii| * max_row_sum (and
max_row_sum < 1), ALL dependencies of the row are made weak
(par_strength.c "make all dependencies weak" branch).

Host-side (numpy): setup is shape-dynamic, runs once per hierarchy.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix


def strength_matrix(
    A: CSRMatrix, theta: float = 0.25, max_row_sum: float = 0.9
) -> sp.csr_matrix:
    """Boolean pattern CSR (data all 1.0), diagonal excluded."""
    n = A.num_rows
    M = A.to_scipy()
    diag = M.diagonal()
    indptr, indices, data = M.indptr, M.indices, M.data

    rows = np.repeat(np.arange(n), np.diff(indptr))
    offdiag_mask = indices != rows

    # row_scale: max (diag<0) or min (diag>=0) over off-diagonal entries;
    # hypre initializes row_scale to 0.0 before the max/min sweep
    neg_diag = diag < 0
    row_max = np.zeros(n)
    np.maximum.at(row_max, rows[offdiag_mask], data[offdiag_mask])
    row_min = np.zeros(n)
    np.minimum.at(row_min, rows[offdiag_mask], data[offdiag_mask])
    row_scale = np.where(neg_diag, row_max, row_min)

    # strong test (strict inequality, par_strength.c drops on <=/>=)
    thresh = theta * row_scale
    strong = np.where(
        neg_diag[rows],
        data > thresh[rows],
        data < thresh[rows],
    )
    strong &= offdiag_mask

    # max_row_sum: make all of row's dependencies weak
    if max_row_sum < 1.0:
        row_sum = np.zeros(n)
        np.add.at(row_sum, rows, data)
        weak_row = np.abs(row_sum) > np.abs(diag) * max_row_sum
        strong &= ~weak_row[rows]

    S = sp.csr_matrix(
        (np.ones(int(strong.sum())), (rows[strong], indices[strong])),
        shape=(n, n),
    )
    S.sort_indices()
    return S


def second_strength(S, cf, num_paths: int = 1):
    """Strength graph among C points for the second aggressive-coarsening
    pass: pattern of S*S + 2S restricted to C rows/cols, entries kept
    when the path count >= num_paths (par_strength.c
    hypre_BoomerAMGCreate2ndS:1724 "(S*S+2S)"; direct edges count 2 so a
    single direct edge survives num_paths=2)."""
    import scipy.sparse as sp

    idx = np.flatnonzero(cf > 0)
    Sb = S.copy().tocsr()
    Sb.data = np.ones_like(Sb.data)
    C = (Sb @ Sb + 2.0 * Sb).tocsr()[idx][:, idx].tocsr()
    C.setdiag(0)
    C.eliminate_zeros()
    if num_paths > 1:
        C.data = np.where(C.data >= num_paths, C.data, 0.0)
        C.eliminate_zeros()
    C.data = np.ones_like(C.data)
    C.sort_indices()
    return C
