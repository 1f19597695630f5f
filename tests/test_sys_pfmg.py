"""SysPFMG multi-variable structured multigrid (reference: sys_pfmg*.c)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from hypre_tpu.struct import StructGrid, StructMatrix
from hypre_tpu.solvers.sstruct_ls.sys_pfmg import SysPFMG, SysPFMGOptions


def two_var_system(shape, coupling=0.2):
    """Two coupled Poisson variables [[A, cI], [cI, A]]; keep
    c < lambda_min(A) (~0.36 at 8^3) so the system stays SPD."""
    ones = np.ones(shape)
    ndim = len(shape)

    def off(d, s):
        o = [0] * ndim
        o[d] = s
        return tuple(o)

    lap = {(0,) * ndim: 2.0 * ndim * ones}
    for d in range(ndim):
        lap[off(d, -1)] = -ones
        lap[off(d, 1)] = -ones
    g = StructGrid(shape)
    A = StructMatrix.from_dict(lap, g)
    C = StructMatrix.from_dict({(0,) * ndim: coupling * ones}, g)
    return {(0, 0): A, (1, 1): A, (0, 1): C, (1, 0): C}, g


@pytest.mark.slow
def test_sys_pfmg_converges():
    shape = (8, 8, 8)
    blocks, g = two_var_system(shape)
    sys = SysPFMG(blocks, g, SysPFMGOptions(tol=1e-8, max_iter=100))
    bs = (jnp.ones(shape), jnp.full(shape, 2.0))
    res = sys.solve(bs)
    assert bool(res.converged)

    # monolithic reference
    n = int(np.prod(shape))
    M = sp.bmat(
        [[blocks[(0, 0)].to_scipy(), blocks[(0, 1)].to_scipy()],
         [blocks[(1, 0)].to_scipy(), blocks[(1, 1)].to_scipy()]]
    ).tocsc()
    rhs = np.concatenate([np.ones(n), np.full(n, 2.0)])
    x_ref = spla.spsolve(M, rhs)
    x = np.concatenate([np.asarray(res.x[0]).ravel(), np.asarray(res.x[1]).ravel()])
    np.testing.assert_allclose(x, x_ref, rtol=1e-5, atol=1e-9)


def test_sys_pfmg_single_var_matches_pfmg_shape():
    shape = (8, 8, 4)
    blocks, g = two_var_system(shape, coupling=0.0)
    sys = SysPFMG({(0, 0): blocks[(0, 0)]}, g)
    assert sys.nvars == 1
    assert sys.levels[0].cdir in (0, 1, 2)
