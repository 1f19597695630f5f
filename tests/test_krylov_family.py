"""Extended Krylov family (reference: krylov/{flexgmres,lgmres,cogmres,cgnr}.c)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.models import difconv_7pt, laplacian_5pt_2d, laplacian_7pt
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.ops.csr import CSRMatrix
from hypre_tpu.solvers.krylov import (
    CGNROptions,
    COGMRESOptions,
    FlexGMRESOptions,
    LGMRESOptions,
    cgnr,
    cogmres,
    flexgmres,
    lgmres,
)


def ops(A):
    E = freeze_auto(A)
    return lambda x: spmv(E, x)


def diag_M(A):
    dinv = jnp.asarray(1.0 / A.diagonal())
    return lambda r: dinv * r


def test_flexgmres_laplacian():
    A = laplacian_5pt_2d(10, 10)
    b = jnp.ones(100)
    res = flexgmres(ops(A), b, M=diag_M(A), opts=FlexGMRESOptions(tol=1e-10, k_dim=20))
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(100))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6)


def test_cogmres_nonsymmetric():
    A = difconv_7pt(8, 8, 4, ax=5.0, ay=5.0, az=0.0)
    n = A.num_rows
    b = jnp.ones(n)
    res = cogmres(ops(A), b, M=diag_M(A), opts=COGMRESOptions(tol=1e-9, k_dim=30, cgs=2))
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5)


def test_cogmres_matches_gmres_iterations():
    from hypre_tpu.solvers.krylov import GMRESOptions, gmres

    A = laplacian_7pt(6, 6, 6)
    b = jnp.ones(216)
    r1 = gmres(ops(A), b, opts=GMRESOptions(tol=1e-8, k_dim=15))
    r2 = cogmres(ops(A), b, opts=COGMRESOptions(tol=1e-8, k_dim=15))
    assert abs(int(r1.num_iterations) - int(r2.num_iterations)) <= 1


def test_lgmres_laplacian():
    A = laplacian_5pt_2d(12, 12)
    n = A.num_rows
    b = jnp.ones(n)
    res = lgmres(ops(A), b, opts=LGMRESOptions(tol=1e-9, k_dim=10, aug_dim=2))
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5)


def test_cgnr_nonsymmetric():
    A = difconv_7pt(6, 6, 3, ax=3.0, ay=3.0, az=1.0)
    n = A.num_rows
    M = A.to_scipy()
    AT = CSRMatrix.from_scipy(M.T.tocsr())
    b = jnp.ones(n)
    res = cgnr(ops(A), ops(AT), b, opts=CGNROptions(tol=1e-8, max_iter=2000))
    x_ref = spla.spsolve(M.tocsc(), np.ones(n))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-4, atol=1e-8)
