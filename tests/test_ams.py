"""AMS edge-element Maxwell tests (reference: ams.c + ams_driver.c,
the BASELINE config #5)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.models.maxwell import curlcurl_matrix, edge_structure
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.amg.ams import AMS, AMSOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg


def test_discrete_identities():
    # curl grad = 0 — the structure-preserving identity AMS relies on
    G, C, coords, ne = edge_structure(4, 3, 2)
    CG = C.to_scipy() @ G.to_scipy()
    assert abs(CG).max() == 0.0


def test_curlcurl_spd():
    A, G, coords = curlcurl_matrix(3, 3, 3, alpha=1.0, beta=0.5)
    M = A.to_scipy()
    assert (abs(M - M.T)).max() < 1e-14
    w = spla.eigsh(M, k=1, which="SA", return_eigenvectors=False)
    assert w[0] > 0


@pytest.mark.slow
def test_ams_pcg_beats_diag_pcg():
    A, G, coords = curlcurl_matrix(6, 6, 6, alpha=1.0, beta=0.1)
    n = A.num_rows
    b = jnp.ones(n)
    ams = AMS(A, G, coords)
    res = ams.solve(b, tol=1e-8, max_iter=100)
    assert bool(res.converged)

    E = freeze_auto(A)
    dinv = jnp.asarray(1.0 / A.diagonal())
    res_d = pcg(
        lambda x: spmv(E, x), b, M=lambda r: dinv * r,
        opts=PCGOptions(tol=1e-8, max_iter=400),
    )
    # auxiliary-space correction must dominate diagonal scaling
    assert int(res.num_iterations) < int(res_d.num_iterations) / 2
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-9)
