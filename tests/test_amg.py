"""BoomerAMG setup + solve tests (reference: TEST_ij pattern — iteration
counts / convergence factors on generated Laplacians)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from hypre_tpu.models import laplacian_5pt_2d, laplacian_7pt
from hypre_tpu.ops import CSRMatrix
from hypre_tpu.ops.spmv import ell_spmv
from hypre_tpu.solvers.amg import (
    BoomerAMG,
    BoomerAMGOptions,
    pmis_coarsen,
    strength_matrix,
    classical_interp,
)
from hypre_tpu.solvers.krylov import PCGOptions, pcg


def test_strength_5pt():
    # 5pt Laplacian: all off-diagonals are -1 = the row min -> all strong
    A = laplacian_5pt_2d(5, 5)
    S = strength_matrix(A, 0.25)
    M = A.to_scipy()
    offd = M.copy()
    offd.setdiag(0)
    offd.eliminate_zeros()
    assert S.nnz == offd.nnz


def test_strength_threshold():
    # anisotropic: weak y-coupling dropped at theta=0.25
    A = laplacian_7pt(6, 6, 1, cx=1.0, cy=0.1)
    S = strength_matrix(A, 0.25)
    M = A.to_scipy().tocoo()
    # strong entries must be the x-neighbors only (value -1.0)
    Sc = S.tocoo()
    n = 6
    for r, c in zip(Sc.row, Sc.col):
        assert abs(r - c) == 1  # x-neighbor in lexicographic order


def test_pmis_partitions_all_points():
    A = laplacian_5pt_2d(10, 10)
    S = strength_matrix(A, 0.25)
    cf = pmis_coarsen(S)
    assert (cf != 0).all()
    assert (cf > 0).any() and (cf < 0).any()
    # C points must form an independent set in S (no strong C-C edge
    # where both survived the same round is NOT guaranteed by PMIS in
    # later rounds; the real invariant: every F point sees a C influencer
    # or had measure < 1)


def test_classical_interp_rowsums():
    # For an M-matrix with zero row sums at interior points, classical
    # interpolation rows sum to ~1 on interior F points.
    A = laplacian_5pt_2d(12, 12)
    S = strength_matrix(A, 0.25)
    cf = pmis_coarsen(S)
    P = classical_interp(A.to_scipy(), S, cf)
    rs = np.asarray(P.sum(axis=1)).ravel()
    is_c = cf > 0
    np.testing.assert_allclose(rs[is_c], 1.0)
    assert P.shape[1] == int(is_c.sum())


@pytest.mark.parametrize("relax", [0, 18, 13, 6, 16])
def test_amg_standalone_converges(relax):
    # 3D: w=1.0 Jacobi (relax 0) smoothing is only effective with the
    # diagonal dominance of the 7-pt operator (2D 5-pt has a marginal
    # (pi,pi) mode) — matches the reference's default 3D test problem
    A = laplacian_7pt(8, 8, 8)
    up = {0: 0, 18: 18, 13: 14, 6: 6, 16: 16}[relax]
    amg = BoomerAMG(
        A,
        # ext+i pairs with PMIS (hypre's default pairing) — classical
        # interp off PMIS coarse grids converges ~0.7/cycle and would
        # need ~80 cycles for 1e-8
        BoomerAMGOptions(relax_down=relax, relax_up=up, interp_type="ext+i"),
    )
    n = A.num_rows
    x_true = np.ones(n)
    b = jnp.asarray(A.to_scipy() @ x_true)
    res = amg.solve(b, tol=1e-8, max_iter=80)
    assert bool(res.converged), f"rel={float(res.rel_residual_norm)}"
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6)


def test_amg_hierarchy_shrinks():
    A = laplacian_7pt(10, 10, 10)
    amg = BoomerAMG(A)
    sizes = [a.shape[0] for a in amg._host_A]
    assert sizes[0] == 1000
    assert all(sizes[i] > sizes[i + 1] for i in range(len(sizes) - 1))
    assert sizes[-1] <= 9 or amg.num_levels == amg.opts.max_levels
    assert 1.0 < amg.grid_complexity() < 2.5
    assert 1.0 < amg.operator_complexity() < 10.0


def test_amg_pcg_7pt():
    # the ex5-style minimum slice: AMG-preconditioned CG
    A = laplacian_7pt(12, 12, 12)
    amg = BoomerAMG(A, BoomerAMGOptions(relax_down=13, relax_up=14))
    E = A.to_ell()
    n = A.num_rows
    op = lambda x: ell_spmv(E, x)[:n]
    b = jnp.ones(n)
    res = pcg(op, b, M=amg.precond, opts=PCGOptions(tol=1e-10, max_iter=100))
    assert bool(res.converged)
    assert int(res.num_iterations) <= 20, int(res.num_iterations)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6)


def test_amg_gs_parity_with_sequential():
    # level-scheduled GS must equal a literal sequential sweep
    from hypre_tpu.solvers.amg.relax import build_gs_schedule, gauss_seidel

    A = laplacian_5pt_2d(7, 6)
    n = A.num_rows
    M = A.to_scipy()
    rng = np.random.default_rng(0)
    u0 = rng.standard_normal(n)
    f = rng.standard_normal(n)

    # sequential reference
    u_ref = u0.copy()
    d = M.diagonal()
    for i in range(n):
        lo, hi = M.indptr[i], M.indptr[i + 1]
        r = f[i] - M.data[lo:hi] @ u_ref[M.indices[lo:hi]]
        u_ref[i] += r / d[i]

    sched = build_gs_schedule(A, forward=True)
    u = gauss_seidel(sched, jnp.asarray(u0), jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-13)

    # backward
    u_ref_b = u0.copy()
    for i in range(n - 1, -1, -1):
        lo, hi = M.indptr[i], M.indptr[i + 1]
        r = f[i] - M.data[lo:hi] @ u_ref_b[M.indices[lo:hi]]
        u_ref_b[i] += r / d[i]
    schedb = build_gs_schedule(A, forward=False)
    ub = gauss_seidel(schedb, jnp.asarray(u0), jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(ub), u_ref_b, rtol=1e-13)


def test_aggressive_coarsening():
    # agg_num_levels=1: much lower operator complexity, more iterations
    # (the classic hypre tradeoff)
    from hypre_tpu.ops.dia import spmv
    from hypre_tpu.solvers.krylov import PCGOptions, pcg

    A = laplacian_7pt(12, 12, 12)
    base = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18))
    agg = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18, agg_num_levels=1))
    assert agg.operator_complexity() < base.operator_complexity() * 0.75
    assert agg.num_levels <= base.num_levels
    b = jnp.asarray(A.to_scipy() @ np.ones(A.num_rows))
    res = pcg(lambda x: spmv(agg.levels[0].A, x), b, M=agg.precond,
              opts=PCGOptions(tol=1e-8, max_iter=80))
    assert bool(res.converged)


def test_nongalerkin_sparsification():
    from hypre_tpu.ops.dia import spmv
    from hypre_tpu.solvers.krylov import PCGOptions, pcg

    A = laplacian_7pt(12, 12, 12)
    base = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18))
    ng = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18, nongalerkin_tol=0.02))
    assert ng.operator_complexity() < base.operator_complexity()
    # row sums preserved by the diagonal lumping
    for l in range(1, ng.num_levels):
        rs_ng = np.asarray(ng._host_A[l].sum(axis=1)).ravel()
        # constants still near the null space (interior rows ~0 row sum
        # propagates through Galerkin for this problem)
        assert np.isfinite(rs_ng).all()
    b = jnp.asarray(A.to_scipy() @ np.ones(A.num_rows))
    res = pcg(lambda x: spmv(ng.levels[0].A, x), b, M=ng.precond,
              opts=PCGOptions(tol=1e-8, max_iter=80))
    assert bool(res.converged)


def test_smoother_variants_fcf_cg_cforder():
    """relax 17 (FCF-Jacobi, par_relax_more.c:661), relax 15 (CG
    smoother), and relax_order=1 CF-ordered GS (par_cycle.c:398)."""
    import jax.numpy as jnp
    import numpy as np

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(8, 8, 8)  # 8^3: same smoother code paths, half the
    b = jnp.asarray(A.to_scipy() @ np.ones(512))  # fast-tier setup cost
    for rlx, order, max_it in [(17, 0, 20), (15, 0, 20), (13, 1, 20), (3, 1, 20)]:
        amg = BoomerAMG(A, BoomerAMGOptions(
            coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
            relax_down=rlx, relax_up={3: 4, 13: 14}.get(rlx, rlx),
            relax_order=order, embed_level1=False))
        res = amg.solve(b, tol=1e-8, max_iter=max_it)
        assert bool(res.converged), f"relax {rlx} order {order}"


def test_masked_gs_exact_vs_sequential():
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp

    from hypre_tpu.ops.csr import CSRMatrix
    from hypre_tpu.solvers.amg.relax import build_gs_schedule, gauss_seidel

    rng = np.random.default_rng(3)
    n = 80
    B = sp.random(n, n, 0.07, random_state=rng)
    M = (B + B.T + sp.diags(np.ones(n) * 9)).tocsr()
    A = CSRMatrix.from_scipy(M)
    f = jnp.asarray(rng.standard_normal(n))
    mask = rng.random(n) < 0.4
    u = gauss_seidel(build_gs_schedule(A, True, mask=mask), jnp.zeros(n), f)
    Md = M.toarray()
    ur = np.zeros(n)
    for i in range(n):
        if mask[i]:
            ur[i] = (float(f[i]) - Md[i, :i] @ ur[:i] - Md[i, i + 1:] @ ur[i + 1:]) / Md[i, i]
    np.testing.assert_allclose(np.asarray(u), ur, atol=1e-14)


def test_cr_and_gsmg_coarsening():
    """CR coarsening (par_cr.c hypre_cr) and GSMG smoothed-vector
    strength (par_gsmg.c) both drive convergent hierarchies."""
    import jax.numpy as jnp
    import numpy as np

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(10, 10, 10)
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    for kw in (dict(coarsen_type="cr"), dict(gsmg=1)):
        amg = BoomerAMG(A, BoomerAMGOptions(
            interp_type="ext+i", P_max_elmts=4,
            relax_down=18, relax_up=18, embed_level1=False, **kw))
        res = amg.solve(b, tol=1e-8, max_iter=60)
        assert bool(res.converged), kw
        assert amg.num_levels >= 3


@pytest.mark.slow  # ~7 s; test_air_distance2_and_neumann keeps AIR fast
def test_air_additive_and_generators():
    """AIR restriction (par_restr.c), additive cycles (par_add_cycle.c),
    rotated-anisotropy and variable-coefficient generators."""
    import jax.numpy as jnp
    import numpy as np

    from hypre_tpu.models import difconv_7pt, rotate_7pt, vardifconv_7pt
    from hypre_tpu.ops.dia import freeze_auto, spmv
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
    from hypre_tpu.solvers.krylov import GMRESOptions, gmres

    A = difconv_7pt(8, 8, 8, 1.0, 1.0, 1.0, 10.0, 10.0, 10.0, 0)
    b = jnp.asarray(A.to_scipy() @ np.ones(512))
    amg = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="direct", P_max_elmts=4,
        relax_down=17, relax_up=17, restrict_type=1, embed_level1=False))
    # R != P^T with AIR
    import scipy.sparse as sp
    assert abs(amg._host_P[0].T - sp.csr_matrix(
        np.zeros(amg._host_P[0].T.shape))).max() > 0  # nonempty
    res = amg.solve(b, tol=1e-8, max_iter=60)
    assert bool(res.converged)

    for M in (rotate_7pt(20, 20, 45.0, 0.01), vardifconv_7pt(8, 8, 8, 0.1)):
        bb = jnp.asarray(M.to_scipy() @ np.ones(M.num_rows))
        amg2 = BoomerAMG(M, BoomerAMGOptions(
            coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
            relax_down=18, relax_up=18, embed_level1=False))
        r = gmres(lambda x, E=freeze_auto(M): spmv(E, x), bb, M=amg2.precond,
                  opts=GMRESOptions(tol=1e-8, max_iter=100))
        assert bool(r.converged)


def test_amgdd_composite_grids():
    """AMG-DD (par_amgdd*.c): per-domain composite hierarchies with
    distance-padding rings; one residual exchange per iteration, local
    FAC cycles.  1 domain == plain FAC-AMG; more domains with enough
    padding still converge."""
    import numpy as np

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg import AMGDD, AMGDDOptions, BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(12, 12, 12)
    amg = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18, embed_level1=False))
    b = A.to_scipy() @ np.ones(12**3)
    r1 = AMGDD(amg, AMGDDOptions(num_domains=1)).solve(b, tol=1e-8, max_iter=30)
    r4 = AMGDD(amg, AMGDDOptions(num_domains=4, padding=2)).solve(b, tol=1e-8, max_iter=40)
    assert bool(r1.converged) and int(r1.num_iterations) <= 8
    assert bool(r4.converged)


def test_solve_transpose():
    """SolveT (par_amg_solve.c hypre_BoomerAMGSolveT): transpose-system
    solve on the transposed hierarchy; equals Solve for symmetric A and
    converges on a nonsymmetric convection-diffusion system."""
    from hypre_tpu.models import difconv_7pt, laplacian_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    opts = BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18, embed_level1=False,
    )
    # symmetric: SolveT == Solve
    A = laplacian_7pt(8, 8, 8)
    amg = BoomerAMG(A, opts)
    b = jnp.asarray(A.to_scipy() @ np.ones(A.num_rows))
    rs = amg.solve(b, tol=1e-8, max_iter=40)
    rt = amg.solveT(b, tol=1e-8, max_iter=40)
    assert int(rs.num_iterations) == int(rt.num_iterations)
    np.testing.assert_allclose(np.asarray(rt.x), np.asarray(rs.x), rtol=1e-10)
    # nonsymmetric: solveT solves A^T x = b
    An = difconv_7pt(8, 8, 8, ax=6.0, ay=3.0, az=1.0)
    amg_n = BoomerAMG(An, opts)
    xt = np.random.default_rng(3).standard_normal(An.num_rows)
    bt = jnp.asarray(An.to_scipy().T @ xt)
    res = amg_n.solveT(bt, tol=1e-9, max_iter=60)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), xt, atol=1e-6)


def test_air_distance2_and_neumann():
    """AIR distance-2 (par_lr_restr.c Dist2AIR) and the Neumann-series
    variant both converge on an advection-dominated system, with
    distance-2 at least as strong as distance-1."""
    from hypre_tpu.models import difconv_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = difconv_7pt(10, 10, 4, ax=20.0, ay=10.0, az=0.0)
    b = jnp.asarray(A.to_scipy() @ np.ones(A.num_rows))
    iters = {}
    for tag, kw in (
        ("air1", dict(restrict_type=1)),
        ("air2", dict(restrict_type=2)),
        ("neumann2", dict(restrict_type=2, air_neumann_degree=2)),
    ):
        amg = BoomerAMG(A, BoomerAMGOptions(
            coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
            relax_down=0, relax_up=0, relax_weight=0.7, relax_order=1,
            embed_level1=False, **kw,
        ))
        res = amg.solve(b, tol=1e-8, max_iter=80)
        assert bool(res.converged), tag
        iters[tag] = int(res.num_iterations)
    assert iters["air2"] <= iters["air1"] + 1


def test_stencil_generator_fast_path_matches_coo():
    """The direct-CSR stencil assembly (round-2 fast path) must agree
    with the COO+dedup path bit-for-bit, including degenerate axes."""
    from hypre_tpu.models.laplacian import (
        _stencil_matrix, _stencil_matrix_coo, laplacian_7pt,
    )

    offs = [(0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
            (0, 0, -1), (0, 0, 1)]
    vals = [6.0, -1.0, -1.0, -2.0, -2.0, -0.5, -0.5]
    for shape in ((5, 4, 3), (6, 1, 4), (1, 5, 5)):
        A = _stencil_matrix(*shape, offs, vals).to_scipy()
        B = _stencil_matrix_coo(*shape, list(zip(offs, vals))).to_scipy()
        assert (abs(A - B)).max() == 0.0
    # row-block generator agrees with the full generator
    from hypre_tpu.models import laplacian_7pt_row_block

    Af = laplacian_7pt(6, 5, 4).to_scipy()
    blocks = [laplacian_7pt_row_block(6, 5, 4, lo, min(lo + 37, 120))
              for lo in range(0, 120, 37)]
    import scipy.sparse as sp

    assert (abs(sp.vstack(blocks) - Af)).max() == 0.0


def test_interp_vec_variants_exact_on_modes():
    """GM/LN interp_vec_variant (par_sv_interp.c role): after
    modification, P interpolates the supplied smooth vectors EXACTLY at
    every F point; the modified hierarchy still solves."""
    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
    from hypre_tpu.solvers.amg.interp import interp_vec_modify

    A = laplacian_7pt(8, 8, 8)
    amg = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18, embed_level1=False,
    ))
    P = amg._host_P[0]
    cf = amg._cf[0]
    n = A.num_rows
    xyz = np.stack(np.meshgrid(*[np.arange(8)] * 3, indexing="ij"),
                   axis=-1).reshape(-1, 3).astype(float)
    V = np.hstack([np.ones((n, 1)), xyz])  # constants + linears
    err0 = np.abs(P @ V[cf > 0] - V)[cf <= 0].max()
    for variant in (2, 1):
        P2 = interp_vec_modify(P, cf, V, variant=variant)
        E = np.abs(P2 @ V[cf > 0] - V)
        if variant == 2:
            # exact wherever the row has enough coarse neighbors to
            # represent all k modes (hypre's GM grows the coarse space
            # for the rest)
            rn = np.diff(P2.indptr)
            full = (~(cf > 0)) & (rn >= V.shape[1])
            assert full.any()
            assert E[full].max() < 1e-9
            assert E[cf <= 0].max() <= err0 + 1e-12
        else:
            assert E[cf <= 0].max() <= err0 + 1e-12


@pytest.mark.slow  # ~15 s; test_amgdd_composite_grids keeps fast AMG-DD coverage
def test_amgdd_device_matches_host_and_shards():
    """AMG-DD's communication-avoiding payoff path (par_amgdd_solve.c):
    the batched device execution reproduces the host composite cycles
    exactly, and the domain axis shards over a mesh with ONE residual
    distribution + ONE owned gather as the only cross-domain steps."""
    import jax

    from hypre_tpu.solvers.amg import AMGDD, AMGDDOptions, BoomerAMG, BoomerAMGOptions
    from hypre_tpu.solvers.amg.amgdd import AMGDDDevice
    from hypre_tpu.models import laplacian_7pt

    A = laplacian_7pt(10, 10, 10)
    amg = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18, embed_level1=False,
    ))
    dd = AMGDD(amg, AMGDDOptions(num_domains=8, padding=2))
    dev = AMGDDDevice(dd, dtype=np.float64)
    r = np.random.default_rng(0).standard_normal(A.num_rows)
    z_host = dd.cycle(r)
    z_dev = np.asarray(dev.cycle(jnp.asarray(r)))
    np.testing.assert_allclose(z_dev, z_host, rtol=1e-10, atol=1e-12)

    # sharded: domain axis over the 8-device mesh — same answer
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hypre_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    sh3 = NamedSharding(mesh, P("shard"))
    lv_sh = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(*( ("shard",) + (None,) * (x.ndim - 1)))))
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 8 else x,
        dev.levels,
    )
    dev.levels = lv_sh
    dev.gidx = jax.device_put(dev.gidx, sh3)
    dev.tgt = jax.device_put(dev.tgt, sh3)
    import jax as _j
    dev._cycle = _j.jit(dev._cycle_impl)
    z_sh = np.asarray(dev.cycle(jnp.asarray(r)))
    np.testing.assert_allclose(z_sh, z_host, rtol=1e-10, atol=1e-12)

    # as a PCG preconditioner it converges
    from hypre_tpu.ops.dia import freeze_auto, spmv
    from hypre_tpu.solvers.krylov import PCGOptions, pcg

    E = freeze_auto(A)
    res = pcg(lambda x: spmv(E, x), jnp.ones(A.num_rows), M=dev.precond,
              opts=PCGOptions(tol=1e-8, max_iter=100))
    assert bool(res.converged)
