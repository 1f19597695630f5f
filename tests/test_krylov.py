"""Krylov solvers vs scipy direct solves (reference: krylov/ + ij driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.models import laplacian_5pt_2d, laplacian_7pt, difconv_7pt
from hypre_tpu.ops.spmv import ell_spmv
from hypre_tpu.solvers.krylov import (
    BiCGSTABOptions,
    GMRESOptions,
    PCGOptions,
    bicgstab,
    gmres,
    pcg,
)


def make_op(A):
    E = A.to_ell()
    n = A.num_rows
    return lambda x: ell_spmv(E, x)[:n]


def diag_precond(A):
    dinv = jnp.asarray(1.0 / A.diagonal())
    return lambda r: dinv * r


def test_pcg_identity_small():
    # A = I: converges in 1 iteration
    from hypre_tpu.ops import CSRMatrix
    import scipy.sparse as sp

    A = CSRMatrix.from_scipy(sp.eye(10).tocsr())
    b = jnp.arange(1.0, 11.0)
    res = pcg(make_op(A), b, opts=PCGOptions(tol=1e-12))
    assert int(res.num_iterations) == 1
    np.testing.assert_allclose(np.asarray(res.x), np.arange(1.0, 11.0), rtol=1e-12)


def test_pcg_laplacian_matches_direct():
    A = laplacian_5pt_2d(10, 10)
    b = jnp.ones(100)
    res = pcg(make_op(A), b, M=diag_precond(A), opts=PCGOptions(tol=1e-10))
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(100))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7)


def test_pcg_two_norm_and_rel_change():
    A = laplacian_7pt(6, 6, 6)
    b = jnp.ones(216)
    res = pcg(
        make_op(A),
        b,
        M=diag_precond(A),
        opts=PCGOptions(tol=1e-8, two_norm=True, rel_change=True),
    )
    assert bool(res.converged)
    r = np.ones(216) - A.to_scipy() @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(np.ones(216)) < 1e-7


def test_pcg_zero_rhs():
    A = laplacian_5pt_2d(5, 5)
    b = jnp.zeros(25)
    res = pcg(make_op(A), b)
    assert int(res.num_iterations) == 0
    np.testing.assert_array_equal(np.asarray(res.x), 0.0)


def test_pcg_max_iter_no_convergence():
    A = laplacian_5pt_2d(20, 20)
    b = jnp.ones(400)
    res = pcg(make_op(A), b, opts=PCGOptions(tol=1e-14, max_iter=3))
    assert int(res.num_iterations) == 3
    assert not bool(res.converged)


def test_pcg_jit():
    A = laplacian_5pt_2d(8, 8)
    op = make_op(A)
    f = jax.jit(lambda b: pcg(op, b, opts=PCGOptions(tol=1e-10)).x)
    b = jnp.ones(64)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(64))
    np.testing.assert_allclose(np.asarray(f(b)), x_ref, rtol=1e-7)


def test_gmres_laplacian():
    A = laplacian_5pt_2d(10, 10)
    b = jnp.ones(100)
    res = gmres(make_op(A), b, M=diag_precond(A), opts=GMRESOptions(tol=1e-10, k_dim=20))
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(100))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6)


def test_gmres_nonsymmetric():
    A = difconv_7pt(8, 8, 8, ax=10.0, ay=10.0, az=10.0)
    n = A.num_rows
    b = jnp.ones(n)
    res = gmres(make_op(A), b, M=diag_precond(A), opts=GMRESOptions(tol=1e-9, k_dim=30))
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5)


def test_bicgstab_nonsymmetric():
    A = difconv_7pt(8, 8, 4, ax=5.0, ay=5.0, az=0.0)
    n = A.num_rows
    b = jnp.ones(n)
    res = bicgstab(make_op(A), b, M=diag_precond(A), opts=BiCGSTABOptions(tol=1e-9))
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5)


def test_pytree_vectors():
    # solvers must work on pytree vectors (the sstruct S+U split shape)
    import scipy.sparse as sp
    from hypre_tpu.ops import CSRMatrix

    A1 = laplacian_5pt_2d(5, 5)
    A2 = laplacian_5pt_2d(4, 4)
    op1, op2 = make_op(A1), make_op(A2)
    Aop = lambda v: {"s": op1(v["s"]), "u": op2(v["u"])}
    b = {"s": jnp.ones(25), "u": jnp.full(16, 2.0)}
    res = pcg(Aop, b, opts=PCGOptions(tol=1e-11))
    x1 = spla.spsolve(A1.to_scipy().tocsc(), np.ones(25))
    x2 = spla.spsolve(A2.to_scipy().tocsc(), np.full(16, 2.0))
    np.testing.assert_allclose(np.asarray(res.x["s"]), x1, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(res.x["u"]), x2, rtol=1e-7)
