"""Distributed struct via GSPMD sharding: cross-decomposition parity
(the smgbase3d/pfmgbase3d same-answer-for-np-1/8 contract)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.parallel import make_mesh
from hypre_tpu.parallel.par_struct import shard_struct, vector_sharding
from hypre_tpu.solvers.struct_ls import PFMG, PFMGOptions, SMG, SMGOptions
from hypre_tpu.struct import StructGrid, StructMatrix, struct_matvec


def poisson7(shape, cx=1.0, cy=1.0, cz=1.0):
    ones = np.ones(shape)
    return StructMatrix.from_dict(
        {(0, 0, 0): 2 * (cx + cy + cz) * ones,
         (-1, 0, 0): -cx * ones, (1, 0, 0): -cx * ones,
         (0, -1, 0): -cy * ones, (0, 1, 0): -cy * ones,
         (0, 0, -1): -cz * ones, (0, 0, 1): -cz * ones},
        StructGrid(shape),
    )


def test_sharded_struct_matvec():
    mesh = make_mesh(8)
    A = poisson7((16, 12, 10), 2.0, 3.0, 40.0)
    x = np.random.default_rng(0).standard_normal((16, 12, 10))
    A_sh, (x_sh,) = shard_struct(A, [x], mesh)
    y_sh = jax.jit(struct_matvec)(A_sh, x_sh)
    y = struct_matvec(A, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y), rtol=1e-11, atol=1e-12)


@pytest.mark.slow  # ~39 s; the 2-D process-grid test solves sharded PFMG fast
def test_sharded_pfmg_iteration_invariance():
    mesh = make_mesh(8)
    shape = (16, 12, 12)
    A = poisson7(shape, 2.0, 3.0, 40.0)
    pf = PFMG(A, PFMGOptions(tol=1e-6, max_iter=60, skip_relax=0))
    res_serial = pf.solve(jnp.ones(shape))
    b_sh = jax.device_put(np.ones(shape), vector_sharding(mesh, 3))
    res_sh = pf.solve(b_sh)
    assert int(res_serial.num_iterations) == int(res_sh.num_iterations)
    np.testing.assert_allclose(
        np.asarray(res_sh.x), np.asarray(res_serial.x), atol=1e-14
    )


def test_sharded_struct_2d_process_grid():
    """2-D process grid (struct -P px py analog, SURVEY §2.14-1): a
    2x4 mesh sharding two grid axes gives the identical matvec as
    serial (the PFMG solve parity on the same grid is the slow-tier
    test below — its 2-D-mesh V-cycle compile dominates the fast
    tier's budget)."""
    from hypre_tpu.parallel.mesh import make_mesh_nd

    mesh = make_mesh_nd((2, 4))
    shape = (8, 8, 10)
    A = poisson7(shape, 2.0, 3.0, 40.0)
    x = np.random.default_rng(1).standard_normal(shape)
    A_sh, (x_sh,) = shard_struct(
        A, [x], mesh, axis_name=mesh.axis_names, grid_axis=(0, 1)
    )
    y_sh = jax.jit(struct_matvec)(A_sh, x_sh)
    y = struct_matvec(A, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y),
                               rtol=1e-11, atol=1e-12)


@pytest.mark.slow  # 2-D-mesh V-cycle compile ~15 s; matvec parity stays fast
def test_sharded_struct_2d_process_grid_pfmg():
    """PFMG solve over the 2x4 process grid == serial (iterations +
    solution)."""
    from hypre_tpu.parallel.mesh import make_mesh_nd

    mesh = make_mesh_nd((2, 4))
    shape = (8, 8, 10)
    A = poisson7(shape, 2.0, 3.0, 40.0)
    pf = PFMG(A, PFMGOptions(tol=1e-8, max_iter=40))
    b = np.asarray(struct_matvec(A, jnp.ones(shape)))
    res_serial = pf.solve(jnp.asarray(b))
    b_sh = jax.device_put(
        b, vector_sharding(mesh, 3, mesh.axis_names, (0, 1))
    )
    res_sh = pf.solve(b_sh)
    assert int(res_sh.num_iterations) == int(res_serial.num_iterations)
    np.testing.assert_allclose(
        np.asarray(res_sh.x), np.asarray(res_serial.x), rtol=1e-10, atol=1e-11
    )
