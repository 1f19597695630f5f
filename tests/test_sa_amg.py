"""Smoothed aggregation AMG (the MLI/femli role)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.amg.smoothed_aggregation import SAOptions, SmoothedAggregationAMG
from hypre_tpu.solvers.krylov import PCGOptions, pcg


def test_sa_amg_pcg():
    A = laplacian_7pt(12, 12, 12)
    n = A.num_rows
    sa = SmoothedAggregationAMG(A)
    assert sa.num_levels >= 2
    E = freeze_auto(A)
    b = jnp.ones(n)
    res = pcg(lambda x: spmv(E, x), b, M=sa.precond,
              opts=PCGOptions(tol=1e-9, max_iter=100))
    assert bool(res.converged)
    assert int(res.num_iterations) <= 25
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6)
