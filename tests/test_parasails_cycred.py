"""ParaSails + cyclic reduction (reference: distributed_ls/ParaSails,
struct_ls/cyclic_reduction.c)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.amg.parasails import ParaSails, ParaSailsOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg
from hypre_tpu.solvers.struct_ls.cyclic_reduction import CyclicReduction, pcr_solve_batched
from hypre_tpu.struct import StructGrid, StructMatrix


def test_parasails_pcg():
    A = laplacian_7pt(8, 8, 8)
    n = A.num_rows
    E = freeze_auto(A)
    ps = ParaSails(A, ParaSailsOptions(thresh=0.0, nlevels=1))
    b = jnp.ones(n)
    res = pcg(lambda x: spmv(E, x), b, M=ps.precond,
              opts=PCGOptions(tol=1e-9, max_iter=200))
    res_d = pcg(lambda x: spmv(E, x), b, opts=PCGOptions(tol=1e-9, max_iter=400))
    assert bool(res.converged)
    assert int(res.num_iterations) < int(res_d.num_iterations)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-9)


def test_pcr_tridiagonal():
    rng = np.random.default_rng(0)
    n = 37
    lower = rng.standard_normal(n) * 0.3
    upper = rng.standard_normal(n) * 0.3
    diag = 2.0 + np.abs(rng.standard_normal(n))
    rhs = rng.standard_normal(n)
    x = np.asarray(pcr_solve_batched(
        jnp.asarray(lower), jnp.asarray(diag), jnp.asarray(upper), jnp.asarray(rhs)
    ))
    import scipy.sparse as sp

    T = sp.diags([lower[1:], diag, upper[:-1]], [-1, 0, 1]).toarray()
    x_ref = np.linalg.solve(T, rhs)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-11)


def test_cyclic_reduction_struct_1d():
    n = 24
    ones = np.ones((n,))
    A = StructMatrix.from_dict(
        {(0,): 2.0 * ones, (-1,): -ones, (1,): -ones}, StructGrid((n,))
    )
    cr = CyclicReduction(A)
    b = jnp.ones(n)
    x = cr.solve(b)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9)
