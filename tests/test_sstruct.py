"""SStruct layer tests (reference: sstruct_mv + TEST_sstruct patterns).

Problem: two 2D parts coupled along a shared interface through the
U-matrix (the sstruct.in.default two-part layout, simplified), solved
with the Split solver and with SStruct-PCG (pytree Krylov reuse).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from hypre_tpu.ops.csr import CSRMatrix
from hypre_tpu.sstruct import SStructGrid, SStructMatrix, sstruct_matvec
from hypre_tpu.sstruct.vector import full, pack_vector, unpack_vector
from hypre_tpu.struct import StructGrid, StructMatrix
from hypre_tpu.solvers.sstruct_ls import SplitOptions, SStructSplit
from hypre_tpu.solvers.krylov import PCGOptions, pcg


def two_part_problem(nx=8, ny=8):
    """Two nx x ny parts side by side; 5-pt Laplacian on each; interface
    couplings (last column of part 0 <-> first column of part 1) in U."""
    g = SStructGrid(
        parts=(
            (StructGrid((nx, ny)),),
            (StructGrid((nx, ny)),),
        )
    )
    ones = np.ones((nx, ny))
    ent = {
        (0, 0): 4.0 * ones,
        (-1, 0): -ones,
        (1, 0): -ones,
        (0, -1): -ones,
        (0, 1): -ones,
    }
    smats = {
        (0, 0, 0): StructMatrix.from_dict(ent, g.grid(0)),
        (1, 0, 0): StructMatrix.from_dict(ent, g.grid(1)),
    }
    # U: couple (nx-1, j) of part0 with (0, j) of part1, value -1
    n = g.total_size
    offs = g.offsets()
    rows, cols = [], []
    for j in range(ny):
        a = offs[(0, 0)] + (nx - 1) * ny + j  # ravel order (x-major C order)
        b = offs[(1, 0)] + 0 * ny + j
        rows += [a, b]
        cols += [b, a]
    U = CSRMatrix.from_coo(rows, cols, [-1.0] * len(rows), (n, n))
    return g, SStructMatrix(g, smats, U)


def test_sstruct_matvec_matches_monolithic():
    g, A = two_part_problem(6, 5)
    rng = np.random.default_rng(0)
    x = tuple(
        tuple(jnp.asarray(rng.standard_normal(gr.shape)) for gr in pv)
        for pv in g.parts
    )
    y = sstruct_matvec(A, x)
    M = A.to_scipy()
    y_ref = M @ np.asarray(pack_vector(x))
    np.testing.assert_allclose(np.asarray(pack_vector(y)), y_ref, rtol=1e-13)


def test_split_solver_converges():
    g, A = two_part_problem(8, 8)
    b = full(g, 1.0)
    res = SStructSplit(A, SplitOptions(tol=1e-8, max_iter=300)).solve(b)
    assert bool(res.converged)
    M = A.to_scipy()
    x_ref = spla.spsolve(M.tocsc(), np.ones(g.total_size))
    np.testing.assert_allclose(
        np.asarray(pack_vector(res.x)), x_ref, rtol=1e-5, atol=1e-8
    )


def test_sstruct_pcg():
    # the krylov_sstruct.c vtable analog: pytree PCG over sstruct vectors
    g, A = two_part_problem(8, 6)
    b = full(g, 1.0)
    res = pcg(
        lambda x: sstruct_matvec(A, x), b, opts=PCGOptions(tol=1e-10, max_iter=300)
    )
    assert bool(res.converged)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(g.total_size))
    np.testing.assert_allclose(
        np.asarray(pack_vector(res.x)), x_ref, rtol=1e-6
    )


@pytest.mark.slow  # ~10 s; split_solver_converges + sstruct_pcg keep both paths fast
def test_split_preconditioned_pcg():
    g, A = two_part_problem(8, 8)
    b = full(g, 1.0)
    split = SStructSplit(A, SplitOptions(tol=0.0, max_iter=1))

    M = jax.jit(split._step) if False else (lambda r: split._step(jax.tree.map(jnp.zeros_like, r), r))
    res = pcg(lambda x: sstruct_matvec(A, x), b, M=M, opts=PCGOptions(tol=1e-10, max_iter=100))
    assert bool(res.converged)
    assert int(res.num_iterations) < 40


import jax  # noqa: E402  (used in test_split_preconditioned_pcg)


@pytest.mark.slow
def test_fac_composite_amr():
    """FAC (sstruct_ls/fac*.c): composite AMR operator with flux-matched
    CF interfaces; patch-solve + coarse-correction cycle converges."""
    import numpy as np
    import jax.numpy as jnp

    from hypre_tpu.solvers.sstruct_ls import FAC, FACOptions, build_composite_poisson

    A, cidx, fidx, nc = build_composite_poisson((12, 12, 12), (3, 3, 3), (6, 6, 6))
    assert A.shape[0] == nc + 12**3
    fac = FAC(A, nc, FACOptions(tol=1e-6, max_iter=40))
    res = fac.solve(jnp.asarray(np.ones(A.shape[0])))
    assert bool(res.converged)


def test_sstruct_maxwell():
    """SStruct Maxwell (maxwell_*.c): grid-topology discrete gradient +
    auxiliary-space cycles on the assembled multi-part edge system."""
    import numpy as np
    import jax.numpy as jnp

    from hypre_tpu.models.maxwell import curlcurl_matrix
    from hypre_tpu.solvers.sstruct_ls import SStructMaxwell

    shape = (6, 6, 6)
    A1, _G, _xyz = curlcurl_matrix(*shape, alpha=1.0, beta=1.0)
    mx = SStructMaxwell([shape, shape], [A1, A1])
    rng = np.random.default_rng(0)
    b = jnp.asarray(mx.A.to_scipy() @ rng.standard_normal(mx.A.num_rows))
    res = mx.solve(b)
    assert bool(res.converged)
    assert int(res.num_iterations) <= 15


@pytest.mark.slow  # ~8 s; fac_composite_amr keeps the FAC path fast
def test_fac_multilevel_amr():
    """Multi-level FAC: 3-level nested refinement (factors 2 then 4),
    arbitrary-depth composite assembly + multiplicative level sweeps
    (fac_amr_rap.c / fac_interp2.c roles)."""
    from hypre_tpu.solvers.sstruct_ls.fac import (
        FAC, FACOptions, build_composite_amr,
    )

    from hypre_tpu.ops.csr import CSRMatrix
    from hypre_tpu.ops.dia import freeze_auto, spmv
    from hypre_tpu.solvers.krylov import GMRESOptions, gmres

    A, ranges, maps = build_composite_amr(
        (10, 10), [((2, 2), (5, 5), 2), ((2, 2), (5, 5), 4)]
    )
    assert len(ranges) == 3
    n = A.shape[0]
    assert ranges[-1][1] == n
    # multi-interface composites are strongly nonsymmetric: FAC rides
    # inside GMRES (the reference's Krylov-wrapped deployment)
    fac = FAC(A, ranges, FACOptions(max_iter=1))
    E = freeze_auto(CSRMatrix.from_scipy(A))
    b = jnp.asarray(np.asarray(A @ np.ones(n)))
    res = gmres(lambda x: spmv(E, x), b,
                M=lambda r: fac.cycle(r, jnp.zeros_like(r)),
                opts=GMRESOptions(tol=1e-8, max_iter=60, k_dim=30))
    assert bool(res.converged)
    assert int(res.num_iterations) <= 25
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-5)


def test_pnedelec_commutes_exactly():
    """PNedelec edge prolongation (maxwell_PNedelec.c): the de Rham
    commutativity G_f P_node == P_edge G_c holds EXACTLY — the coarse
    edge space is a genuine Nedelec space."""
    from hypre_tpu.models.maxwell import edge_structure
    from hypre_tpu.solvers.sstruct_ls.maxwell import pnedelec_interp

    nx = ny = nz = 4
    Gf = edge_structure(nx, ny, nz)[0].to_scipy()
    Gc = edge_structure(nx // 2, ny // 2, nz // 2)[0].to_scipy()
    Pe, Pn = pnedelec_interp(nx, ny, nz)
    assert abs(Gf @ Pn - Pe @ Gc).max() == 0.0


def test_maxwell_tv_cycles():
    """Maxwell TV multigrid (maxwell_TV_setup.c): PNedelec-coarsened
    edge hierarchy with per-level gradient-subspace corrections."""
    from hypre_tpu.models.maxwell import curlcurl_matrix
    from hypre_tpu.solvers.sstruct_ls.maxwell import MaxwellTV, MaxwellTVOptions

    nx = ny = nz = 8
    Ac, _G, _xyz = curlcurl_matrix(nx, ny, nz, alpha=1.0, beta=1.0)
    tv = MaxwellTV((nx, ny, nz), Ac, MaxwellTVOptions(tol=1e-8, max_iter=120))
    assert len(tv.levels) >= 2
    n = Ac.num_rows
    b = jnp.asarray(Ac.to_scipy() @ np.random.default_rng(0).standard_normal(n))
    res = tv.solve(b)
    assert bool(res.converged)
    assert int(res.num_iterations) <= 20


def test_neighbor_part_coordinate_transforms():
    """GridSetNeighborPart with a 90-degree rotated part
    (sstruct_grid.c index_map/index_dir): the transform-generated U
    couplings make the two-part operator permutation-equivalent to the
    plain single-grid Laplacian — exactness, not just convergence."""
    import scipy.sparse as sp
    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.sstruct.grid import SStructGrid
    from hypre_tpu.sstruct.matrix import SStructMatrix
    from hypre_tpu.sstruct.neighbors import NeighborPart, build_u_from_neighbors
    from hypre_tpu.struct.grid import StructGrid
    from hypre_tpu.struct.matrix import StructMatrix

    nx, ny = 5, 4  # global domain: 2*nx x ny, split at x = nx
    ones0 = np.ones((nx, ny))
    ones1 = np.ones((ny, nx))  # part 1 is ROTATED: local (a, b) -> global (nx+b, ny-1-a)
    ent5 = lambda o: {(0, 0): 4.0 * o, (-1, 0): -o, (1, 0): -o,
                     (0, -1): -o, (0, 1): -o}
    g = SStructGrid(parts=(
        (StructGrid((nx, ny)),),
        (StructGrid((ny, nx)),),
    ))
    smats = {
        (0, 0, 0): StructMatrix.from_dict(ent5(ones0), StructGrid((nx, ny))),
        (1, 0, 0): StructMatrix.from_dict(ent5(ones1), StructGrid((ny, nx))),
    }
    rels = [
        NeighborPart(part=0, ilower=(nx, 0), iupper=(nx, ny - 1),
                     nbor_part=1, nbor_ilower=(0, 0), nbor_iupper=(ny - 1, 0),
                     coord=(1, 0), dir=(1, -1)),
        NeighborPart(part=1, ilower=(0, -1), iupper=(ny - 1, -1),
                     nbor_part=0, nbor_ilower=(nx - 1, 0),
                     nbor_iupper=(nx - 1, ny - 1), coord=(1, 0), dir=(-1, 1)),
    ]
    stencils = {0: ent5(ones0), 1: ent5(ones1)}
    U = build_u_from_neighbors(g, stencils, rels)
    A = SStructMatrix(g, smats, umat=U)
    Ac = A.to_scipy()

    # permutation to the plain (2nx, ny) grid (x-fastest would differ;
    # use C-order (x, y) consistently)
    Aref = laplacian_7pt(2 * nx, ny, 1).to_scipy()  # gid = ix + 2nx*iy
    perm = np.zeros(2 * nx * ny, dtype=np.int64)
    k = 0
    for ix in range(nx):          # part 0 dofs, C-order (ix, iy)
        for iy in range(ny):
            perm[k] = ix + 2 * nx * iy
            k += 1
    for a in range(ny):           # part 1 dofs
        for b in range(nx):
            gx, gy = nx + b, ny - 1 - a
            perm[k] = gx + 2 * nx * gy
            k += 1
    Pm = sp.csr_matrix((np.ones(len(perm)), (np.arange(len(perm)), perm)),
                       shape=(len(perm), len(perm)))
    err = abs(Pm @ Aref @ Pm.T - Ac).max()
    assert err < 1e-12
