"""North-star protocol oracle parity (BASELINE.md pinned counts).

The reference oracle (hypre 2.20 serial, scripts/
build_reference_oracle.sh) solves 3D 7-pt Poisson with b = ones via
AMG-PCG (two-norm test, tol 1e-6, PMIS + classical interp Pmx 4 +
l1-Jacobi) in EXACTLY 20 iterations at 48^3 and 25 at 96^3.  The host
f64 pipeline must reproduce these bit-for-bit-equivalent counts — the
cross-code analog of the reference's .saved regression contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import spmv
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg

# BASELINE.md pinned counts (hypre 2.20 ij driver, -pmis -interptype 0
# -Pmx 4 -rlx 18 -tol 1e-6, b = ones, two-norm test)
ORACLE = {48: 20, 96: 25, 256: 36}
# The graded bench's production config (f32 vectors + bf16 matrices +
# nongalerkin 0.02) converges in 21 at 96^3: the bf16 rounding +
# non-Galerkin drop + device truncation tie-set shave 4 iterations off
# the f64 oracle path (same hierarchy structure; documented in
# ops/device_setup.py).  Pinned so the graded number can't drift
# silently.
PRODUCTION_96 = 21


def _solve(nx, opts, dtype, tol=1e-6, max_iter=80):
    n = nx**3
    A = laplacian_7pt(nx, nx, nx)
    amg = BoomerAMG(A, opts)
    b = jnp.ones(n, dtype)
    levels = amg.levels_tuple
    op = lambda x: spmv(levels[0].A, x)
    M = lambda r: amg.cycle(r, levels=levels)
    return pcg(op, b, M=M,
               opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))


@pytest.mark.slow
def test_oracle_iteration_parity_48():
    res = _solve(48, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18, dtype="float64",
        nongalerkin_tol=0.0, embed_level1=False, relocate_level2=False,
    ), jnp.float64)
    assert bool(res.converged)
    assert int(res.num_iterations) == ORACLE[48]


@pytest.mark.slow
def test_oracle_iteration_parity_96_f64():
    """The bench-size pin: host f64 path == hypre's 25 at 96^3."""
    res = _solve(96, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18, dtype="float64",
        nongalerkin_tol=0.0, embed_level1=False, relocate_level2=False,
    ), jnp.float64)
    assert bool(res.converged)
    assert int(res.num_iterations) == ORACLE[96]


@pytest.mark.slow
def test_production_config_pin_96():
    """The graded bench protocol itself (f32/bf16/nongalerkin 0.02,
    classical interp): pinned at 21 iterations — NOT the f64 oracle's
    25; see PRODUCTION_96 above for why the counts differ."""
    res = _solve(96, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18, dtype="float32", mat_dtype="bfloat16",
        nongalerkin_tol=0.02, relocate_level2=True,
        lattice_shape=(96, 96, 96),
    ), jnp.float32)
    assert bool(res.converged)
    assert int(res.num_iterations) == PRODUCTION_96, (
        f"graded-bench iteration count drifted: {int(res.num_iterations)} "
        f"!= pinned {PRODUCTION_96} (f64 oracle: {ORACLE[96]})"
    )
