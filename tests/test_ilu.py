"""ILU preconditioners (reference: parcsr_ls/par_ilu*.c)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from hypre_tpu.models import difconv_7pt, laplacian_7pt
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.amg.ilu import ILU, ILUOptions, ilu0_factor
from hypre_tpu.solvers.krylov import GMRESOptions, PCGOptions, gmres, pcg


def test_ilu0_factor_exact_on_triangular_pattern():
    # for a matrix whose LU fill stays within the pattern, ILU(0) = LU
    A = sp.diags([[-1.0] * 9, [4.0] * 10, [-1.0] * 9], [-1, 0, 1]).tocsr()
    L, U = ilu0_factor(A)
    err = abs((L @ U - A)).max()
    assert err < 1e-12


def test_ilu0_apply_is_triangular_solve():
    A = laplacian_7pt(5, 5, 3)
    ilu = ILU(A)
    rng = np.random.default_rng(0)
    r = rng.standard_normal(A.num_rows)
    z = np.asarray(ilu.solve(jnp.asarray(r)))
    # reference: scipy triangular solves with the same factors
    L, U = ilu0_factor(A.to_scipy())
    z_ref = spla.spsolve_triangular(
        U.tocsr(), spla.spsolve_triangular(L.tocsr(), r, lower=True), lower=False
    )
    np.testing.assert_allclose(z, z_ref, rtol=1e-10, atol=1e-12)


def test_ilu0_pcg():
    A = laplacian_7pt(8, 8, 8)
    n = A.num_rows
    E = freeze_auto(A)
    ilu = ILU(A)
    b = jnp.ones(n)
    res = pcg(lambda x: spmv(E, x), b, M=ilu.precond,
              opts=PCGOptions(tol=1e-9, max_iter=200))
    res_d = pcg(lambda x: spmv(E, x), b,
                opts=PCGOptions(tol=1e-9, max_iter=400))
    assert bool(res.converged)
    assert int(res.num_iterations) < int(res_d.num_iterations)


def test_ilut_gmres_nonsymmetric():
    A = difconv_7pt(7, 7, 4, ax=8.0, ay=8.0, az=2.0)
    n = A.num_rows
    E = freeze_auto(A)
    ilu = ILU(A, ILUOptions(type=1, droptol=1e-3))
    b = jnp.ones(n)
    res = gmres(lambda x: spmv(E, x), b, M=ilu.precond,
                opts=GMRESOptions(tol=1e-9, k_dim=30, max_iter=300))
    assert bool(res.converged)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-9)


def test_iluk_fill_levels_improve_pcg():
    """Native ILU(k): higher fill -> fewer PCG iterations (Euclid role)."""
    from hypre_tpu.solvers.amg.ilu import iluk_factor

    A = laplacian_7pt(10, 10, 10)
    n = A.num_rows
    E = freeze_auto(A)
    b = jnp.ones(n)
    iters = {}
    for k in (0, 1, 2):
        ilu = ILU(A, ILUOptions(type=0, fill_level=k))
        res = pcg(lambda x: spmv(E, x), b, M=ilu.precond,
                  opts=PCGOptions(tol=1e-9, max_iter=300))
        assert bool(res.converged)
        iters[k] = int(res.num_iterations)
    assert iters[2] < iters[1] < iters[0]
    # factor residual shrinks with k on the union pattern
    As = A.to_scipy()
    L0, U0 = iluk_factor(As, 0)
    L2, U2 = iluk_factor(As, 2)
    assert abs(L2 @ U2 - As).max() < abs(L0 @ U0 - As).max()


def test_native_ilut_matches_role():
    """Native dual-threshold ILUT (no scipy/SuperLU in the loop)."""
    from hypre_tpu import native
    from hypre_tpu.solvers.amg.ilu import ilut_factor

    if not native.available():
        pytest.skip("no C compiler")
    A = laplacian_7pt(8, 8, 8).to_scipy()
    L, U, pr, pc = ilut_factor(A, droptol=1e-3, max_row_nnz=20)
    assert pr is None  # native path, no permutation
    E = abs(L @ U - A).max()
    assert E < 0.2  # inexactness bounded by the drop threshold
    # tighter threshold -> more accurate
    L2, U2, _, _ = ilut_factor(A, droptol=1e-5, max_row_nnz=40)
    assert abs(L2 @ U2 - A).max() < E


def test_ij_driver_ilu_solvers():
    """ij.c solver 80 (hypre_ILU stationary) and 81 (ILU-GMRES)."""
    from hypre_tpu.drivers import ij as ij_driver

    r81 = ij_driver.run("-n 8 8 8 -solver 81 -ilu_lfil 1 -tol 1e-8".split())
    assert bool(r81.converged)
    r80 = ij_driver.run("-n 6 6 6 -solver 80 -tol 1e-6 -max_iter 200".split())
    assert float(r80.rel_residual_norm) < 1e-6


def test_schur_ilu_pipeline():
    """PILUT-style Schur-complement ILU (pilut/ + par_ilu GMRES-Schur
    role): interior blocks are domain-decoupled (block-diagonal B),
    interface unknowns reduce to an inner-GMRES Schur solve; the
    preconditioner beats plain ILU(0) block-Jacobi-style on iteration
    count for the same outer solver."""
    from hypre_tpu.solvers.amg.ilu import SchurILU, SchurILUOptions

    A = laplacian_7pt(10, 10, 6)
    n = A.num_rows
    E = freeze_auto(A)
    schur = SchurILU(A, SchurILUOptions(num_domains=4, fill_level=1))
    # interior block really is domain-decoupled
    assert schur.ni > 0 and schur.ni < n
    b = jnp.ones(n)
    res = gmres(lambda x: spmv(E, x), b, M=schur.precond,
                opts=GMRESOptions(tol=1e-8, max_iter=100, k_dim=40))
    assert bool(res.converged)
    assert int(res.num_iterations) <= 25
