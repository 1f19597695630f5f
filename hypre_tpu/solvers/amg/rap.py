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
