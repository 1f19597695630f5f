"""Struct layer + PFMG tests (reference: TEST_struct/pfmgbase3d.saved:
'struct -n 12 12 12 -c 2.0 3.0 40 -solver 1' -> 10 iterations,
final rel res 3.298941e-07; driver sets skip=0, relax=1, rap=0)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.struct import StructGrid, StructMatrix, struct_matvec
from hypre_tpu.solvers.struct_ls import PFMG, PFMGOptions


def poisson7(shape, cx=1.0, cy=1.0, cz=1.0):
    ones = np.ones(shape)
    return StructMatrix.from_dict(
        {
            (0, 0, 0): 2 * (cx + cy + cz) * ones,
            (-1, 0, 0): -cx * ones,
            (1, 0, 0): -cx * ones,
            (0, -1, 0): -cy * ones,
            (0, 1, 0): -cy * ones,
            (0, 0, -1): -cz * ones,
            (0, 0, 1): -cz * ones,
        },
        StructGrid(shape),
    )


def test_struct_matvec_matches_scipy():
    A = poisson7((5, 4, 3), 1.0, 2.0, 3.0)
    x = np.random.default_rng(0).standard_normal((5, 4, 3))
    y = struct_matvec(A, jnp.asarray(x))
    y_ref = (A.to_scipy() @ x.ravel()).reshape(5, 4, 3)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-13)


def test_struct_matrix_scipy_roundtrip():
    A = poisson7((4, 3, 2))
    M = A.to_scipy()
    B = StructMatrix.from_scipy(M, (4, 3, 2))
    np.testing.assert_allclose(
        np.asarray(B.entry((0, 0, 0))), np.asarray(A.entry((0, 0, 0)))
    )
    assert (B.to_scipy() != M).nnz == 0


def test_struct_matvec_periodic():
    shape = (6, 4, 1)
    ones = np.ones(shape)
    A = StructMatrix.from_dict(
        {(0, 0, 0): 4 * ones, (-1, 0, 0): -ones, (1, 0, 0): -ones,
         (0, -1, 0): -ones, (0, 1, 0): -ones},
        StructGrid(shape, periodic=(6, 4, 0)),
    )
    x = np.random.default_rng(1).standard_normal(shape)
    y = struct_matvec(A, jnp.asarray(x))
    y_ref = (A.to_scipy() @ x.ravel()).reshape(shape)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-13)


@pytest.mark.slow
def test_pfmg_base3d_iterations():
    # TEST_struct/pfmgbase3d.saved: 10 iterations @ 12^3, c=(2,3,40)
    A = poisson7((12, 12, 12), 2.0, 3.0, 40.0)
    pfmg = PFMG(A, PFMGOptions(tol=1e-6, max_iter=100, skip_relax=0))
    res = pfmg.solve(jnp.ones((12, 12, 12)))
    assert int(res.num_iterations) == 10
    assert float(res.rel_residual_norm) < 1e-6


def test_pfmg_solves_correctly():
    shape = (8, 8, 8)
    A = poisson7(shape)
    pfmg = PFMG(A, PFMGOptions(tol=1e-10, max_iter=60, skip_relax=0))
    b = jnp.ones(shape)
    res = pfmg.solve(b)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(512)).reshape(shape)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7)


def test_pfmg_anisotropic_semicoarsens():
    A = poisson7((8, 8, 8), 1.0, 1.0, 100.0)
    pfmg = PFMG(A)
    # strong z coupling -> first coarsening directions must be z (2)
    assert pfmg.levels[0].cdir == 2
    assert pfmg.levels[1].cdir == 2


@pytest.mark.slow
def test_smg_base3d_iterations():
    # TEST_struct/smgbase3d.saved: 4 iterations, rel res 8.971901e-07
    from hypre_tpu.solvers.struct_ls import SMG, SMGOptions

    A = poisson7((12, 12, 12), 2.0, 3.0, 40.0)
    res = SMG(A, SMGOptions(tol=1e-6)).solve(jnp.ones((12, 12, 12)))
    assert int(res.num_iterations) == 4
    np.testing.assert_allclose(
        float(res.rel_residual_norm), 8.971901e-07, rtol=1e-2
    )


def test_smg_solves_correctly():
    from hypre_tpu.solvers.struct_ls import SMG, SMGOptions

    shape = (8, 8, 8)
    A = poisson7(shape)
    res = SMG(A, SMGOptions(tol=1e-10, max_iter=40)).solve(jnp.ones(shape))
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(512)).reshape(shape)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7)


def test_constant_coefficient_matrix():
    """struct_matrix.h constant_coefficient storage: scalar entries are
    static constants folded into the fused stencil kernel."""
    import numpy as np
    import jax.numpy as jnp

    from hypre_tpu.struct import StructGrid, StructMatrix
    from hypre_tpu.struct.matrix import struct_matvec

    g = StructGrid((8, 8, 8))
    # all-constant 7-pt stencil
    ent = {(0, 0, 0): 6.0}
    for d in range(3):
        for s in (-1, 1):
            o = [0, 0, 0]
            o[d] = s
            ent[tuple(o)] = -1.0
    A = StructMatrix.from_dict(ent, g)
    assert A.data.shape[0] == 0 and len(A.const_offsets) == 7
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 8, 8)))
    y = struct_matvec(A, x)
    # reference: same stencil with variable arrays
    ones = np.ones((8, 8, 8))
    Av = StructMatrix.from_dict({o: v * ones for o, v in ent.items()}, g)
    yv = struct_matvec(Av, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yv), rtol=1e-14)
    # scipy equivalence (boundary truncation included)
    np.testing.assert_allclose(
        np.asarray(y).ravel(), A.to_scipy() @ np.asarray(x).ravel(), rtol=1e-12
    )


def test_mixed_constant_variable_pfmg():
    import numpy as np

    from hypre_tpu.struct import StructGrid, StructMatrix
    from hypre_tpu.solvers.struct_ls import PFMG, PFMGOptions

    g = StructGrid((12, 12, 12))
    ones = np.ones((12, 12, 12))
    ent = {(0, 0, 0): 6.0 * ones}  # variable diag, constant off-diags
    for d in range(3):
        for s in (-1, 1):
            o = [0, 0, 0]
            o[d] = s
            ent[tuple(o)] = -1.0
    A = StructMatrix.from_dict(ent, g)
    import jax.numpy as jnp

    b = jnp.asarray(np.ones((12, 12, 12)))
    res = PFMG(A, PFMGOptions(tol=1e-6, max_iter=30, skip_relax=0)).solve(b)
    assert bool(res.converged)


@pytest.mark.slow
def test_sparse_msg_anisotropic():
    """SparseMSG (struct_ls/sparse_msg*.c): multiple semicoarsened grids
    with restrict_count averaging and visit-weight (lambda_d partition)
    correction filtering; robust on strong anisotropy."""
    import numpy as np
    import jax.numpy as jnp

    from hypre_tpu.struct import StructGrid, StructMatrix
    from hypre_tpu.solvers.struct_ls import SparseMSG, SparseMSGOptions

    nx = 16
    g = StructGrid((nx, nx, nx))
    ones = np.ones((nx, nx, nx))
    cx, cy, cz = 1.0, 10.0, 100.0
    ent = {(0, 0, 0): 2 * (cx + cy + cz) * ones}
    for d, c in enumerate((cx, cy, cz)):
        for s in (-1, 1):
            o = [0, 0, 0]
            o[d] = s
            ent[tuple(o)] = -c * ones
    A = StructMatrix.from_dict(ent, g)
    b = jnp.asarray(np.ones((nx, nx, nx)))
    res = SparseMSG(A, SparseMSGOptions(tol=1e-6, max_iter=40)).solve(b)
    assert bool(res.converged)
    assert int(res.num_iterations) <= 15


@pytest.mark.slow
def test_smg_recursive_plane_solver():
    """Planes above the dense cap use the batched 2-D SMG recursion
    (smg_relax.c analog) — the round-1 NotImplementedError cliff."""
    import hypre_tpu.solvers.struct_ls.smg as smg_mod
    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.struct_ls.smg import SMG, SMGOptions
    from hypre_tpu.struct import StructMatrix

    n = 24
    old = smg_mod._PLANE_DENSE_MAX
    smg_mod._PLANE_DENSE_MAX = 128  # force the recursive plane solver
    try:
        A_csr = laplacian_7pt(n, n, n).to_scipy()
        A = StructMatrix.from_scipy(A_csr, (n, n, n), periodic=(0, 0, 0))
        # FULL depth: per-level compiled V-cycle pieces keep each XLA
        # program bounded (the round-2 single-graph formulation needed a
        # max_levels=3 clamp to avoid an XLA:CPU compiler stack overflow)
        smg = SMG(A, SMGOptions(tol=1e-6, max_iter=60))
        b = jnp.asarray(np.asarray(A_csr @ np.ones(n**3)).reshape(n, n, n))
        res = smg.solve(b)
        assert bool(res.converged)
        # full-depth recursive-plane hierarchy: 5 iters (4 exact-plane)
        assert int(res.num_iterations) <= 8
        assert np.allclose(np.asarray(res.x).ravel(), 1.0, atol=1e-4)
    finally:
        smg_mod._PLANE_DENSE_MAX = old


def test_generic_point_relax():
    """point_relax.c:1592 generic engine: pointsets as strided
    sublattices, each updating from a fresh residual.  One full-lattice
    set == weighted Jacobi bitwise; the 8-color (2,2,2)-stride sweep is
    a multicolor GS that damps error faster than one Jacobi sweep."""
    import numpy as np

    from hypre_tpu.solvers.struct_ls import (
        point_jacobi,
        point_relax,
        pointset_mask,
    )
    from hypre_tpu.struct.matrix import struct_matvec

    shape = (10, 10, 10)
    A = poisson7(shape, 1.0, 1.0, 1.0)
    dinv = 1.0 / np.asarray(A.data[A.offsets.index((0, 0, 0))])
    rng = np.random.default_rng(5)
    u0 = jnp.asarray(rng.standard_normal(shape))
    f = jnp.zeros(shape)

    full = pointset_mask(shape, (1, 1, 1), (0, 0, 0))
    u_pr = point_relax(A, dinv, u0, f, [full], weight=0.8)
    u_j = point_jacobi(A, dinv, u0, f, weight=0.8)
    np.testing.assert_array_equal(np.asarray(u_pr), np.asarray(u_j))

    colors = [((2, 2, 2), (i, j, k))
              for i in (0, 1) for j in (0, 1) for k in (0, 1)]
    u_mc = point_relax(A, dinv, u0, f, colors)
    e_mc = float(jnp.linalg.norm(u_mc))   # exact solution is 0
    e_j = float(jnp.linalg.norm(point_jacobi(A, dinv, u0, f)))
    assert e_mc < e_j  # multicolor GS beats one Jacobi sweep
    # every point belongs to exactly one color
    cover = sum(np.asarray(pointset_mask(shape, s, i)).astype(int)
                for s, i in colors)
    assert (cover == 1).all()
