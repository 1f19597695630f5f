"""PILUT — distributed_ls/pilut's own Schur pipeline (partial ILUT +
explicit approximate Schur + recursive reduction), vs the GMRES-in-
Schur variant already covered by test_ilu."""

import numpy as np
import numpy.linalg as la
import jax.numpy as jnp
import pytest

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.amg.pilut import PILUT, PILUTOptions, partial_ilut
from hypre_tpu.solvers.krylov import GMRESOptions, gmres


def test_partial_ilut_exact_schur():
    """droptol=0, unlimited fill: the eliminated system IS the exact
    block LU — S == C - E B^{-1} F to roundoff (pilut/parilut.c's
    elimination semantics)."""
    A = laplacian_7pt(6, 6, 6).to_scipy().tocsr()
    ni = 150
    L, U, S = partial_ilut(A, ni, droptol=0.0, lfil=10**9)
    Ad = A.toarray()
    B, F = Ad[:ni, :ni], Ad[:ni, ni:]
    E, C = Ad[ni:, :ni], Ad[ni:, ni:]
    S_exact = C - E @ la.solve(B, F)
    assert np.abs(S.toarray() - S_exact).max() < 1e-12
    # unit lower / upper structure
    assert (L.diagonal() == 0).all()  # strict part stored
    Lc = L.tocoo()
    assert (Lc.col < np.minimum(Lc.row, ni)).all()
    Uc = U.tocoo()
    assert (Uc.col >= Uc.row).all()


def test_pilut_pipeline_preconditions():
    """Multi-stage PILUT beats unpreconditioned GMRES and exercises
    >=2 stages (the recursive reduction)."""
    A = laplacian_7pt(10, 10, 10)
    E_ = freeze_auto(A)
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    op = lambda x: spmv(E_, x)
    p = PILUT(A, PILUTOptions(num_domains=4, droptol=1e-3, lfil=30))
    assert len(p.stages) >= 2
    res = gmres(op, b, M=p.precond,
                opts=GMRESOptions(tol=1e-8, max_iter=100, k_dim=30))
    assert bool(res.converged)
    base = gmres(op, b, opts=GMRESOptions(tol=1e-8, max_iter=200, k_dim=30))
    assert int(res.num_iterations) < int(base.num_iterations)


def test_pilut_droptol_tradeoff():
    """Looser dropping -> sparser factors; the preconditioner still
    converges (pilut's dual (droptol, lfil) rule)."""
    A = laplacian_7pt(8, 8, 8)
    E_ = freeze_auto(A)
    b = jnp.asarray(A.to_scipy() @ np.ones(512))
    op = lambda x: spmv(E_, x)
    tight = PILUT(A, PILUTOptions(droptol=1e-4, lfil=40))
    loose = PILUT(A, PILUTOptions(droptol=5e-2, lfil=5))
    rt = gmres(op, b, M=tight.precond,
               opts=GMRESOptions(tol=1e-8, max_iter=150, k_dim=30))
    rl = gmres(op, b, M=loose.precond,
               opts=GMRESOptions(tol=1e-8, max_iter=150, k_dim=30))
    assert bool(rt.converged) and bool(rl.converged)
    assert int(rt.num_iterations) <= int(rl.num_iterations)
