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
    """Boolean pattern CSR (data all 1.0), diagonal excluded.

    Accepts a CSRMatrix or a scipy CSR; pass scipy's native int32-index
    matrix to hit the conversion-free native path."""
    from ... import native

    M = A.to_scipy() if hasattr(A, "to_scipy") else A.tocsr()
    S = native.strength_classical(M, theta, max_row_sum)
    if S is not None:
        return S
    n = M.shape[0]
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


def strength_matrix_abs(
    A, theta: float = 0.25, max_row_sum: float = 0.9
) -> sp.csr_matrix:
    """Absolute-value strength (par_strength.c hypre_BoomerAMGCreateSabs):
    j strong iff |a_ij| > theta * max_{k != i} |a_ik| (all-positive
    nodal norm matrices)."""
    from ... import native

    S = native.strength_classical(
        A.to_scipy() if hasattr(A, "to_scipy") else A,
        theta, max_row_sum, sabs=True,
    )
    if S is not None:
        return S
    M = A.to_scipy() if hasattr(A, "to_scipy") else A.tocsr()
    n = M.shape[0]
    diag = M.diagonal()
    indptr, indices, data = M.indptr, M.indices, np.abs(M.data)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    offdiag = indices != rows
    row_max = np.zeros(n)
    np.maximum.at(row_max, rows[offdiag], data[offdiag])
    strong = (data > theta * row_max[rows]) & offdiag
    if max_row_sum < 1.0:
        # Sabs inverts the weak-row test: diagonally-DOMINANT rows go
        # weak (|row_sum| < |diag|*(2 - max_row_sum), all terms |.|)
        row_sum = np.zeros(n)
        np.add.at(row_sum, rows, data)  # data already |.|
        weak_row = row_sum < np.abs(diag) * (2.0 - max_row_sum)
        strong &= ~weak_row[rows]
    S = sp.csr_matrix(
        (np.ones(int(strong.sum())), (rows[strong], indices[strong])), shape=(n, n)
    )
    S.sort_indices()
    return S


def create_nodal_A(
    A: sp.csr_matrix, num_functions: int, option: int = 1, diag_option: int = 0
) -> sp.csr_matrix:
    """Nodal norm matrix for nodal-systems coarsening
    (par_nodal_systems.c hypre_BoomerAMGCreateNodalA:38): collapse each
    num_functions x num_functions block to a scalar norm.
      option 1: frobenius   2: sum of |.|   3: largest |element|
      4: inf norm (max over block rows of the |.| row sum,
         par_nodal_systems.c:330-343)
      6: signed sum of all elements
    diag_option 1: diagonal = -(sum of off-diagonal entries);
    diag_option 2: diagonal entries negated (par_nodal_systems.c:395).
    Interleaved unknowns (node = i // num_functions) assumed.
    """
    nf = num_functions
    Ac = A.tocoo()
    nn = A.shape[0] // nf
    nr = Ac.row // nf
    ncol = Ac.col // nf
    mode = abs(option)
    if mode == 1:
        M = sp.csr_matrix((Ac.data**2, (nr, ncol)), shape=(nn, nn))
        M.sum_duplicates()
        M.data = np.sqrt(M.data)
    elif mode == 2:
        M = sp.csr_matrix((np.abs(Ac.data), (nr, ncol)), shape=(nn, nn))
        M.sum_duplicates()
    elif mode == 3:
        # the SIGNED element of largest magnitude per block
        # (par_nodal_systems.c:295-297 stores A_diag_data[k], not its
        # abs — signs survive, so CreateS's signed test applies)
        key = nr.astype(np.int64) * nn + ncol
        uk, inv = np.unique(key, return_inverse=True)
        mx = np.zeros(len(uk))
        np.maximum.at(mx, inv, np.abs(Ac.data))
        sign = np.ones(len(uk))
        # a signed value whose |.| equals the block max wins; ties at
        # equal magnitude with opposite signs resolve to the LAST such
        # entry in the reference's row order — use the positive one
        # only if some positive entry attains the max
        neg_at_max = np.zeros(len(uk), dtype=bool)
        pos_at_max = np.zeros(len(uk), dtype=bool)
        at_max = np.abs(Ac.data) == mx[inv]
        np.logical_or.at(neg_at_max, inv[at_max], Ac.data[at_max] < 0)
        np.logical_or.at(pos_at_max, inv[at_max], Ac.data[at_max] > 0)
        sign = np.where(neg_at_max & ~pos_at_max, -1.0, 1.0)
        M = sp.csr_matrix(
            (sign * mx,
             ((uk // nn).astype(np.int64), (uk % nn).astype(np.int64))),
            shape=(nn, nn),
        )
    elif mode == 6:
        M = sp.csr_matrix((Ac.data, (nr, ncol)), shape=(nn, nn))
        M.sum_duplicates()
    else:  # mode 4: block inf norm — max over the block's rows of the
        # per-row |.| sums (the reference accumulates data[.., j] per
        # function row j then takes hypre_max over j)
        key = (nr.astype(np.int64) * nn + ncol) * nf + (Ac.row % nf)
        uk, inv = np.unique(key, return_inverse=True)
        rowsum = np.zeros(len(uk))
        np.add.at(rowsum, inv, np.abs(Ac.data))
        blk = uk // nf  # node-pair id per per-function row sum
        ub, binv = np.unique(blk, return_inverse=True)
        mx = np.zeros(len(ub))
        np.maximum.at(mx, binv, rowsum)
        M = sp.csr_matrix(
            (mx, ((ub // nn).astype(np.int64), (ub % nn).astype(np.int64))),
            shape=(nn, nn),
        )
    M = M.tocsr()
    M.sort_indices()
    if diag_option == 1:
        off = M - sp.diags(M.diagonal())
        M = (off + sp.diags(-np.asarray(off.sum(axis=1)).ravel())).tocsr()
    elif diag_option == 2:
        M = (M - 2.0 * sp.diags(M.diagonal())).tocsr()
    return M


def gsmg_strength(
    A: sp.csr_matrix,
    nsamples: int = 5,
    nu: int = 5,
    seed: int = 2747,
    dof_func=None,
) -> sp.csr_matrix:
    """GSMG smoothed-vector strength (par_gsmg.c:54
    hypre_ParCSRMatrixFillSmooth + ChooseThresh:250 + Threshold:287).

    Relax nsamples random vectors on the homogeneous system, normalize
    each to 1/nsamples, set S_ij = 1 / sum_k |p_k(i) - p_k(j)| on A's
    off-diagonal pattern (same-function, nonzero entries), then keep
    entries >= minimax threshold (the minimum over rows of the row max).
    """
    from ...utils.lcg import lcg_fill

    M = A.tocsr() if not hasattr(A, "to_scipy") else A.to_scipy()
    n = M.shape[0]
    diag = M.diagonal()
    dsafe = np.where(diag == 0, 1.0, diag)
    Aoff = M - sp.diags(diag)

    samples = np.empty((nsamples, n))
    skip = 0
    for k in range(nsamples):
        e = 2.0 * lcg_fill(seed, n, skip) - 1.0
        skip += n
        for _ in range(nu):  # weighted-Jacobi smoothing of the error
            e = e - (2.0 / 3.0) * ((M @ e) / dsafe)
        samples[k] = e
    nrm = np.linalg.norm(samples, axis=1)
    samples /= np.where(nrm == 0, 1.0, nrm)[:, None] * nsamples

    Mc = M.tocoo()
    offd = Mc.row != Mc.col
    same = (
        np.ones(Mc.nnz, bool)
        if dof_func is None
        else np.asarray(dof_func)[Mc.row] == np.asarray(dof_func)[Mc.col]
    )
    sel = offd & same & (Mc.data != 0)
    dsum = np.zeros(Mc.nnz)
    for k in range(nsamples):
        dsum[sel] += np.abs(samples[k][Mc.row[sel]] - samples[k][Mc.col[sel]])
    vals = np.zeros(Mc.nnz)
    ok = sel & (dsum > 0)
    vals[ok] = 1.0 / dsum[ok]

    Sv = sp.csr_matrix((vals, (Mc.row, Mc.col)), shape=(n, n))
    Sv.eliminate_zeros()
    # minimax threshold
    rows = np.repeat(np.arange(n), np.diff(Sv.indptr))
    rowmax = np.zeros(n)
    if Sv.nnz:
        np.maximum.at(rowmax, rows, Sv.data)
    nzrows = rowmax > 0
    thresh = rowmax[nzrows].min() if nzrows.any() else 0.0
    keep = Sv.data >= thresh
    S = sp.csr_matrix(
        (np.ones(int(keep.sum())), (rows[keep], Sv.indices[keep])), shape=(n, n)
    )
    S.sort_indices()
    return S
