"""LOBPCG tests (reference: krylov/lobpcg.c via TEST_lobpcg patterns)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.models import laplacian_5pt_2d
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.eigen import LOBPCGOptions, lobpcg


def test_lobpcg_smallest_eigs():
    A = laplacian_5pt_2d(12, 12)
    n = A.num_rows
    m = 4
    E = freeze_auto(A)
    Aop = lambda X: jnp.stack([spmv(E, X[:, k]) for k in range(X.shape[1])], axis=1)

    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((n, m)))
    res = lobpcg(Aop, X0, opts=LOBPCGOptions(tol=1e-8, max_iter=200))
    assert res.converged

    w_ref = spla.eigsh(A.to_scipy(), k=m, which="SM", return_eigenvectors=False)
    np.testing.assert_allclose(
        np.sort(np.asarray(res.eigenvalues)), np.sort(w_ref), rtol=1e-6
    )


@pytest.mark.slow  # ~7 s; smallest_eigs keeps the LOBPCG path fast
def test_lobpcg_preconditioned_faster():
    A = laplacian_5pt_2d(16, 16)
    n = A.num_rows
    m = 2
    E = freeze_auto(A)
    Aop = lambda X: jnp.stack([spmv(E, X[:, k]) for k in range(X.shape[1])], axis=1)
    dinv = jnp.asarray(1.0 / A.diagonal())

    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.standard_normal((n, m)))
    res_plain = lobpcg(Aop, X0, opts=LOBPCGOptions(tol=1e-6, max_iter=300))
    res_prec = lobpcg(
        Aop, X0, T=lambda R: dinv[:, None] * R,
        opts=LOBPCGOptions(tol=1e-6, max_iter=300),
    )
    assert res_prec.converged
    assert res_prec.num_iterations <= res_plain.num_iterations + 5
