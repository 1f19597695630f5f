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

ORACLE = {32: None, 48: 20}  # BASELINE.md (96: 25 exercised by bench)


@pytest.mark.slow
def test_oracle_iteration_parity_48():
    nx = 48
    n = nx**3
    A = laplacian_7pt(nx, nx, nx)
    amg = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18, dtype="float64",
        nongalerkin_tol=0.0, embed_level1=False, relocate_level2=False,
    ))
    b = jnp.ones(n, jnp.float64)
    levels = amg.levels_tuple
    op = lambda x: spmv(levels[0].A, x)
    M = lambda r: amg.cycle(r, levels=levels)
    res = pcg(op, b, M=M,
              opts=PCGOptions(tol=1e-6, max_iter=60, two_norm=True))
    assert bool(res.converged)
    assert int(res.num_iterations) == ORACLE[48]
