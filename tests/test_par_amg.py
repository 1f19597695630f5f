"""Distributed AMG over the CPU mesh: iteration-count invariance across
shard counts (the .saved cross-np agreement contract)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.parallel import make_mesh
from hypre_tpu.parallel.par_amg import ParAMG
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg


@pytest.fixture(scope="module")
def problem():
    A = laplacian_7pt(12, 12, 12)
    amg = BoomerAMG(
        A,
        BoomerAMGOptions(
            coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
            relax_down=18, relax_up=18, embed_level1=False,
        ),
    )
    return A, amg


def test_par_cycle_matches_serial(problem):
    A, amg = problem
    n = A.num_rows
    rng = np.random.default_rng(0)
    f_host = rng.standard_normal(n)

    z_serial = np.asarray(amg.cycle(jnp.asarray(f_host)))

    mesh = make_mesh(8)
    pamg = ParAMG(amg, mesh, repl_threshold=400)
    assert pamg.split >= 1
    f = pamg.fine.pad_vec(f_host)
    z = pamg.fine.unpad(pamg.cycle(f))
    np.testing.assert_allclose(z, z_serial, rtol=1e-11, atol=1e-13)


def test_par_amg_pcg_iteration_invariance(problem):
    A, amg = problem
    n = A.num_rows
    b_host = np.ones(n)
    iters = {}
    for ns in (1, 4, 8):
        mesh = make_mesh(ns)
        pamg = ParAMG(amg, mesh, repl_threshold=400)
        P = pamg.fine
        b = P.pad_vec(b_host)
        res = pcg(P.matvec_fn, b, M=pamg.precond,
                  opts=PCGOptions(tol=1e-10, max_iter=60))
        assert bool(res.converged)
        iters[ns] = int(res.num_iterations)
    assert iters[1] == iters[4] == iters[8]
