"""AME Maxwell eigensolver (reference: ame.c)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from hypre_tpu.models.maxwell import curlcurl_matrix, edge_structure
from hypre_tpu.ops.csr import CSRMatrix
from hypre_tpu.solvers.amg.ame import AME, AMEOptions


@pytest.mark.slow
def test_ame_smallest_nonzero_modes():
    # A = C^T C + small mass shift; M = I.  The gradient deflation must
    # steer LOBPCG to the divergence-free (nonzero curl) modes.
    nx = ny = nz = 4
    A, G, coords = curlcurl_matrix(nx, ny, nz, alpha=1.0, beta=0.01)
    ne = A.num_rows
    M = CSRMatrix.from_scipy(sp.eye(ne, format="csr"))
    ame = AME(A, M, G, coords, AMEOptions(nev=3, tol=1e-6, max_iter=100))
    res = ame.solve()
    evs = np.sort(np.asarray(res.eigenvalues))

    # reference: eigenvalues of A restricted to the complement of
    # range(G) — dense, with a RANK-AWARE basis (G annihilates constants,
    # so naive QR projects out one dimension too many)
    As = A.to_scipy().toarray()
    Gs = G.to_scipy().toarray()
    u, sv, _ = np.linalg.svd(Gs, full_matrices=False)
    q = u[:, sv > 1e-10 * sv.max()]
    Pc = np.eye(ne) - q @ q.T
    w = np.linalg.eigvalsh(Pc @ As @ Pc)
    w_pos = np.sort(w[w > 0.02])[:3]  # skip the deflated ~0.01*gradient band
    np.testing.assert_allclose(evs, w_pos, rtol=1e-3)
