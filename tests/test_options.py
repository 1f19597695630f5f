"""Option-breadth coverage: per-position sweep counts
(HYPRE_BoomerAMGSetCycleNumSweeps), min_coarse_size
(HYPRE_BoomerAMGSetMinCoarseSize), Sabs strength
(HYPRE_BoomerAMGSetSabs / par_strength.c hypre_BoomerAMGCreateSabs)."""

import jax.numpy as jnp
import numpy as np

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

_COMMON = dict(coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
               relax_down=18, relax_up=18, embed_level1=False)


def test_cycle_num_sweeps():
    A = laplacian_7pt(10, 10, 10)
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    base = BoomerAMG(A, BoomerAMGOptions(**_COMMON))
    r0 = base.solve(b, tol=1e-8, max_iter=60)
    two = BoomerAMG(A, BoomerAMGOptions(
        num_sweeps_down=2, num_sweeps_up=2, **_COMMON))
    r2 = two.solve(b, tol=1e-8, max_iter=60)
    assert bool(r0.converged) and bool(r2.converged)
    # stronger smoothing converges in fewer (or equal) iterations
    assert int(r2.num_iterations) < int(r0.num_iterations)
    # asymmetric down/up also converges
    asym = BoomerAMG(A, BoomerAMGOptions(
        num_sweeps_down=2, num_sweeps_up=1, **_COMMON))
    ra = asym.solve(b, tol=1e-8, max_iter=60)
    assert bool(ra.converged)


def test_min_coarse_size():
    A = laplacian_7pt(12, 12, 12)
    base = BoomerAMG(A, BoomerAMGOptions(**_COMMON))
    lim = BoomerAMG(A, BoomerAMGOptions(min_coarse_size=120, **_COMMON))
    assert lim.num_levels < base.num_levels
    # every coarse grid respects the floor
    assert all(m.shape[0] >= 120 for m in lim._host_A[1:])
    b = jnp.asarray(A.to_scipy() @ np.ones(A.num_rows))
    assert bool(lim.solve(b, tol=1e-8, max_iter=60).converged)


def test_sabs_strength():
    from hypre_tpu.models import difconv_7pt

    # sign-indefinite off-diagonals: convection-diffusion
    A = difconv_7pt(10, 10, 10, 1.0, 1.0, 1.0, 8.0, 8.0, 8.0, 0)
    amg = BoomerAMG(A, BoomerAMGOptions(strength_abs=True, **_COMMON))
    b = jnp.asarray(A.to_scipy() @ np.ones(A.num_rows))
    from hypre_tpu.ops.dia import freeze_auto, spmv
    from hypre_tpu.solvers.krylov import GMRESOptions, gmres

    E = freeze_auto(A)
    res = gmres(lambda x: spmv(E, x), b, M=amg.precond,
                opts=GMRESOptions(tol=1e-8, max_iter=150, k_dim=30))
    assert bool(res.converged)
    # Sabs vs signed strength differ on a mixed-sign row: the signed
    # test ignores positive off-diagonals (diag > 0), Sabs keeps them
    import scipy.sparse as sp

    from hypre_tpu.solvers.amg.strength import (
        strength_matrix,
        strength_matrix_abs,
    )

    M = sp.csr_matrix(np.array([
        [4.0, -1.0, 2.0],
        [-1.0, 4.0, -1.0],
        [2.0, -1.0, 4.0],
    ]))
    S_signed = strength_matrix(M, 0.25, 1.0)
    S_abs = strength_matrix_abs(M, 0.25, 1.0)
    assert S_abs.nnz > S_signed.nnz
    assert S_abs[0, 2] != 0 and S_signed[0, 2] == 0
