"""Pattern/boolean matrix operations and CF-block extraction.

Reference: parcsr_mv/par_csr_bool_matop.c (pattern-only products used by
coarsening/interp internals), par_csr_aat.c (A A^T for dependency
graphs), gen_fffc.c (FF/FC submatrix extraction feeding MGR, AIR and
two-stage interpolation).

Host-side scipy implementations — these run in the setup phase, where
the hierarchy construction lives (SURVEY §7 stance).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def bool_multiply(A, B) -> sp.csr_matrix:
    """Pattern product: (A != 0) @ (B != 0) as a 0/1 CSR
    (par_csr_bool_matop.c hypre_ParBooleanMatmul role)."""
    Ab = (A != 0).astype(np.int8)
    Bb = (B != 0).astype(np.int8)
    C = (Ab @ Bb)
    C.data[:] = 1
    return C.tocsr()


def aat(A) -> sp.csr_matrix:
    """A @ A^T with summed duplicates (par_csr_aat.c hypre_ParAat role)."""
    A = A.tocsr()
    C = (A @ A.T.tocsr()).tocsr()
    C.sum_duplicates()
    C.sort_indices()
    return C


def fffc_split(A, cf: np.ndarray):
    """Split A by the CF marker into its four blocks
    (gen_fffc.c hypre_ParCSRMatrixGenerateFFFC role):
    returns (A_FF, A_FC, A_CF, A_CC) with rows/cols in the compressed
    F-order / C-order numbering."""
    A = A.tocsr()
    cf = np.asarray(cf)
    fidx = np.flatnonzero(cf <= 0)
    cidx = np.flatnonzero(cf > 0)
    AF = A[fidx]
    AC = A[cidx]
    return (
        AF[:, fidx].tocsr(),
        AF[:, cidx].tocsr(),
        AC[:, fidx].tocsr(),
        AC[:, cidx].tocsr(),
    )
