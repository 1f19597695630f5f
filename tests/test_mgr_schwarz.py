"""MGR + Schwarz (reference: par_mgr*.c, schwarz.c)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.models import laplacian_7pt, laplacian_5pt_2d
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.amg.mgr import MGR, MGROptions
from hypre_tpu.solvers.amg.schwarz import Schwarz, SchwarzOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg


def test_schwarz_fgmres():
    from hypre_tpu.solvers.krylov import FlexGMRESOptions, flexgmres, GMRESOptions, gmres

    A = laplacian_7pt(10, 10, 5)
    n = A.num_rows
    E = freeze_auto(A)
    sw = Schwarz(A, SchwarzOptions(block_size=100, overlap=20))
    b = jnp.ones(n)
    res = flexgmres(lambda x: spmv(E, x), b, M=sw.precond,
                    opts=FlexGMRESOptions(tol=1e-9, max_iter=200, k_dim=20))
    res_d = gmres(lambda x: spmv(E, x), b,
                  opts=GMRESOptions(tol=1e-9, max_iter=400, k_dim=20))
    assert bool(res.converged)
    assert int(res.num_iterations) < int(res_d.num_iterations)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-9)


def test_mgr_two_level():
    # tag alternating unknowns as C (a contrived multiphysics split)
    A = laplacian_5pt_2d(12, 12)
    n = A.num_rows
    cm = (np.arange(n) % 2 == 0)
    mgr = MGR(A, cm)
    b = jnp.ones(n)
    res = mgr.solve(A, b, tol=1e-9)
    assert bool(res.converged)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-9)


def test_mgr_multilevel():
    A = laplacian_7pt(8, 8, 4)
    n = A.num_rows
    cm0 = (np.arange(n) % 2 == 0)
    n1 = int(cm0.sum())
    cm1 = (np.arange(n1) % 2 == 0)
    mgr = MGR(A, [cm0, cm1])
    b = jnp.ones(n)
    res = mgr.solve(A, b, tol=1e-8)
    assert bool(res.converged)
