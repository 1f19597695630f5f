"""Regression parity with the reference's TEST_ij/default.saved.

Reference config (TEST_ij/default.jobs:11): `ij -pmis -Pmx 0 -rlx 0 -xisone`
= 10^3 7-pt Laplacian, PMIS coarsening, ext+i interpolation, no P
truncation, Jacobi relaxation (w=1), GE coarse solve, max_row_sum=1.0
(ij.c:254), tol 1e-8, b = A*ones.

Committed baselines (TEST_ij/default.saved:2-6):
  iterations 48, avg conv factor 0.678738,
  grid complexity 1.407, operator complexity 3.252344.

Setup parity here is BITWISE: validated against a sequential build of the
reference (same level sizes [1000,354,47,6], same nnz [6400,12410,1969,36],
CSR patterns identical, values to ~4e-15).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

DEFAULT_OPTS = BoomerAMGOptions(
    coarsen_type="pmis",
    interp_type="ext+i",
    relax_down=0,
    relax_up=0,
    P_max_elmts=0,
    max_row_sum=1.0,
)


@pytest.fixture(scope="module")
def amg_default():
    A = laplacian_7pt(10, 10, 10)
    return A, BoomerAMG(A, DEFAULT_OPTS)


def test_grid_complexity(amg_default):
    _, amg = amg_default
    assert amg.grid_complexity() == pytest.approx(1.407, abs=1e-12)


def test_operator_complexity(amg_default):
    _, amg = amg_default
    assert amg.operator_complexity() == pytest.approx(3.252344, abs=1e-6)


def test_level_sizes(amg_default):
    _, amg = amg_default
    assert [a.shape[0] for a in amg._host_A] == [1000, 354, 47, 6]
    assert [a.nnz for a in amg._host_A] == [6400, 12410, 1969, 36]


@pytest.mark.slow
def test_iterations_and_conv_factor(amg_default):
    A, amg = amg_default
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    res = amg.solve(b, tol=1e-8, max_iter=100)
    iters = int(res.num_iterations)
    assert iters == 48
    norms = np.asarray(res.res_norms)
    np.testing.assert_allclose(
        norms[1:4], [9.348995, 5.297870, 3.220631], rtol=1e-6
    )
    cf = (norms[iters] / norms[0]) ** (1.0 / iters)
    assert cf == pytest.approx(0.678738, abs=1e-6)


@pytest.mark.slow
def test_w_cycle_parity():
    # oracle: ij -pmis -Pmx 0 -rlx 0 -xisone -mu 2 -> 48 iters, cf 0.677795
    A = laplacian_7pt(10, 10, 10)
    import dataclasses

    amg = BoomerAMG(A, dataclasses.replace(DEFAULT_OPTS, cycle_type=2))
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    res = amg.solve(b, tol=1e-8, max_iter=100)
    it = int(res.num_iterations)
    assert it == 48
    norms = np.asarray(res.res_norms)
    assert (norms[it] / norms[0]) ** (1.0 / it) == pytest.approx(0.677795, abs=1e-6)


def test_standard_interp_oracle_bitwise():
    """interp_type 8/9 (par_lr_interp.c BuildStdInterp): validated
    bitwise (3.9e-16) against the sequential oracle's dumped P0 for the
    10^3 7-pt Laplacian with PMIS; this test pins the built-in result."""
    import numpy as np
    import jax.numpy as jnp

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(10, 10, 10)
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    for it in ("standard", "standard-sep"):
        amg = BoomerAMG(A, BoomerAMGOptions(
            coarsen_type="pmis", interp_type=it, P_max_elmts=4,
            max_row_sum=1.0, relax_down=13, relax_up=14, embed_level1=False))
        res = amg.solve(b, tol=1e-8, max_iter=40)
        # oracle (ij -interptype 8): 14 iterations
        assert int(res.num_iterations) <= 15, it


def test_ff_ff1_interp_converge():
    """interp 12 (FF) and 13 (FF1): both validated BITWISE (maxdiff 0.0)
    vs the sequential oracle's dumped P0 (10^3 Laplacian, PMIS); this
    pins solve behavior."""
    import numpy as np
    import jax.numpy as jnp

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(10, 10, 10)
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    for it in ("ff", "ff1"):
        amg = BoomerAMG(A, BoomerAMGOptions(
            coarsen_type="pmis", interp_type=it, P_max_elmts=4,
            max_row_sum=1.0, relax_down=18, relax_up=18, embed_level1=False))
        res = amg.solve(b, tol=1e-8, max_iter=40)
        assert bool(res.converged), it
