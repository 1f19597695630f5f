"""Hybrid solvers (reference: parcsr_ls/amg_hybrid.c, struct_ls/hybrid.c)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.solvers.amg.hybrid import AMGHybrid, AMGHybridOptions
from hypre_tpu.struct import StructGrid, StructMatrix
from hypre_tpu.solvers.struct_ls import StructHybrid, StructHybridOptions


def test_amg_hybrid_easy_problem_stays_dscg():
    # well-conditioned: DSCG converges fast, no AMG switch
    A = laplacian_7pt(6, 6, 6)
    h = AMGHybrid(A, AMGHybridOptions(tol=1e-8))
    b = jnp.ones(216)
    res = h.solve(b)
    assert bool(res.converged)
    assert h._amg is None  # never switched


def test_amg_hybrid_switches_on_hard_problem():
    # ill-conditioned enough that cf_tol triggers the AMG phase (12^3
    # keeps the switch at a third of 16^3's fast-tier cost)
    A = laplacian_7pt(12, 12, 12)
    h = AMGHybrid(A, AMGHybridOptions(tol=1e-10, cf_tol=0.5))
    b = jnp.ones(12**3)
    res = h.solve(b)
    assert bool(res.converged)
    assert h._amg is not None
    r = np.ones(12**3) - A.to_scipy() @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.sqrt(12**3) < 1e-9


@pytest.mark.slow  # ~32 s; DSCG->MG switch covered fast by test_amg_hybrid*
def test_struct_hybrid():
    shape = (10, 10, 10)
    ones = np.ones(shape)
    A = StructMatrix.from_dict(
        {(0, 0, 0): 6.0 * ones,
         (-1, 0, 0): -ones, (1, 0, 0): -ones,
         (0, -1, 0): -ones, (0, 1, 0): -ones,
         (0, 0, -1): -ones, (0, 0, 1): -ones},
        StructGrid(shape),
    )
    h = StructHybrid(A, StructHybridOptions(tol=1e-8, cf_tol=0.5, dscg_max_iter=10))
    res = h.solve(jnp.ones(shape))
    assert bool(res.converged)
