"""MGR + Schwarz (reference: par_mgr*.c, schwarz.c)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.models import laplacian_7pt, laplacian_5pt_2d
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.amg.mgr import MGR, MGROptions
from hypre_tpu.solvers.amg.schwarz import Schwarz, SchwarzOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg


def test_schwarz_fgmres():
    from hypre_tpu.solvers.krylov import FlexGMRESOptions, flexgmres, GMRESOptions, gmres

    A = laplacian_7pt(10, 10, 5)
    n = A.num_rows
    E = freeze_auto(A)
    sw = Schwarz(A, SchwarzOptions(block_size=100, overlap=20))
    b = jnp.ones(n)
    res = flexgmres(lambda x: spmv(E, x), b, M=sw.precond,
                    opts=FlexGMRESOptions(tol=1e-9, max_iter=200, k_dim=20))
    res_d = gmres(lambda x: spmv(E, x), b,
                  opts=GMRESOptions(tol=1e-9, max_iter=400, k_dim=20))
    assert bool(res.converged)
    assert int(res.num_iterations) < int(res_d.num_iterations)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-9)


def test_mgr_two_level():
    # tag alternating unknowns as C (a contrived multiphysics split)
    A = laplacian_5pt_2d(12, 12)
    n = A.num_rows
    cm = (np.arange(n) % 2 == 0)
    mgr = MGR(A, cm)
    b = jnp.ones(n)
    res = mgr.solve(A, b, tol=1e-9)
    assert bool(res.converged)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-9)


def test_mgr_multilevel():
    A = laplacian_7pt(8, 8, 4)
    n = A.num_rows
    cm0 = (np.arange(n) % 2 == 0)
    n1 = int(cm0.sum())
    cm1 = (np.arange(n1) % 2 == 0)
    mgr = MGR(A, [cm0, cm1])
    b = jnp.ones(n)
    res = mgr.solve(A, b, tol=1e-8)
    assert bool(res.converged)


def _mgr_case(opts, tol=1e-9):
    A = laplacian_5pt_2d(12, 12)
    n = A.num_rows
    cm = (np.arange(n) % 2 == 0)
    mgr = MGR(A, cm, opts)
    b = jnp.ones(n)
    res = mgr.solve(A, b, tol=tol)
    assert bool(res.converged), opts
    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.ones(n))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-4, atol=1e-8)
    return res


def test_mgr_block_variants():
    """CPR-style block-diagonal-inverse interpolation + block F-relax
    (par_mgr.c hypre_blockRelax_setup/hypre_blockRelax,
    hypre_MGRBuildP block path)."""
    base = _mgr_case(MGROptions())
    blk = _mgr_case(MGROptions(interp_type="blk_jacobi",
                               frelax="blk_jacobi", blk_size=2,
                               num_f_sweeps=2))
    # block inverse is at least as strong a reduction as point Jacobi
    assert int(blk.num_iterations) <= int(base.num_iterations) + 2


def test_mgr_approx_inv_and_classical():
    """Approximate-inverse interpolation (par_mgr.c:2696, NSH inverse)
    and classical modified interpolation (par_mgr.c else-branch)."""
    _mgr_case(MGROptions(interp_type="approx_inv"))
    _mgr_case(MGROptions(interp_type="classical"))


def test_mgr_restrict_and_galerkin():
    """Non-injection restriction (MGRBuildP on A^T) and the Galerkin
    coarse grid (mgr_coarse_grid_method 0): R A P must equal the
    assembled reduced operator."""
    import scipy.sparse as sp

    A = laplacian_5pt_2d(10, 10)
    n = A.num_rows
    cm = (np.arange(n) % 3 == 0)
    o = MGROptions(interp_type="jacobi", restrict_type="jacobi",
                   coarse_grid_method="galerkin")
    mgr = MGR(A, cm, o)
    # explicit check of the Galerkin product
    As = A.to_scipy().tocsr()
    cidx = np.flatnonzero(cm); fidx = np.flatnonzero(~cm)
    Aff = As[fidx][:, fidx]; Afc = As[fidx][:, cidx]
    Acf = As[cidx][:, fidx]; Acc = As[cidx][:, cidx]
    dffi = 1.0 / Aff.diagonal()
    Wp = (-sp.diags(dffi) @ Afc).tocsr()
    Wr = (-Acf @ sp.diags(dffi)).tocsr()
    Ac_ref = Acc + Acf @ Wp + Wr @ Afc + Wr @ Aff @ Wp
    Ac_got = mgr.amg._host_A[0]
    assert abs(Ac_got - Ac_ref).max() < 1e-12
    b = jnp.ones(n)
    res = mgr.solve(A, b, tol=1e-9)
    assert bool(res.converged)


def test_mgr_amg_frelax():
    """Frelax_method 1: a BoomerAMG V-cycle as the F-relaxation."""
    res = _mgr_case(MGROptions(frelax="amg"))
    base = _mgr_case(MGROptions())
    assert int(res.num_iterations) <= int(base.num_iterations)


def test_nsh_inverse_quality():
    """The MR+NSH approximate inverse reduces ||I - A M|| vs diagonal."""
    import scipy.sparse as sp
    from hypre_tpu.solvers.amg.mgr import nsh_approx_inverse

    A = laplacian_5pt_2d(8, 8).to_scipy().tocsr()
    n = A.shape[0]
    I = sp.identity(n, format="csr")
    M = nsh_approx_inverse(A, droptol=1e-3, max_row_nnz=8)
    r_nsh = spla.norm((I - A @ M).tocsr())
    r_diag = spla.norm((I - A @ sp.diags(1.0 / A.diagonal())).tocsr())
    assert r_nsh < 0.6 * r_diag


def test_smooth_type_schwarz_and_parasails():
    """BoomerAMG smooth_type 6 (Schwarz) / 8 (ParaSails) level
    smoothers (par_amg.h smooth_type, par_cycle.c: levels below
    smooth_num_levels smooth with the aux solver instead of
    relaxation) — both converge and beat plain l1-Jacobi on 10^3."""
    import jax.numpy as jnp

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(10, 10, 10)
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    common = dict(coarsen_type="pmis", interp_type="ext+i",
                  P_max_elmts=4, relax_down=18, relax_up=18,
                  embed_level1=False, dtype="float64")
    base = BoomerAMG(A, BoomerAMGOptions(**common))
    nb = int(base.solve(b, tol=1e-8, max_iter=60).num_iterations)
    for st, field in ((6, "schwarz"), (8, "parasails")):
        amg = BoomerAMG(A, BoomerAMGOptions(
            smooth_type=st, smooth_num_levels=2, **common))
        assert getattr(amg.levels[0], field) is not None
        assert getattr(amg.levels[1], field) is not None
        assert getattr(amg.levels[2], field) is None  # beyond num_levels
        r = amg.solve(b, tol=1e-8, max_iter=60)
        assert bool(r.converged)
        assert int(r.num_iterations) < nb


def test_schwarz_variants():
    """schwarz.c variants (HYPRE_SchwarzSetVariant): RAS (hybrid
    default), classical additive (variant 2, PoU-damped), and
    two-color multiplicative (variants 0/3's sequential sweep with
    color classes as the parallel width).  RAS/additive are SPD-safe
    (PCG); multiplicative is nonsymmetric (GMRES), and stronger."""
    from hypre_tpu.solvers.krylov import GMRESOptions, gmres

    A = laplacian_7pt(10, 10, 10)
    E = freeze_auto(A)
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    op = lambda x: spmv(E, x)
    iters = {}
    for v in ("ras", "additive"):
        sw = Schwarz(A, SchwarzOptions(variant=v))
        res = pcg(op, b, M=sw.precond, opts=PCGOptions(tol=1e-8, max_iter=200))
        assert bool(res.converged), v
        iters[v] = int(res.num_iterations)
    swm = Schwarz(A, SchwarzOptions(variant="multiplicative")).attach(op)
    rm = gmres(op, b, M=swm.precond,
               opts=GMRESOptions(tol=1e-8, max_iter=200, k_dim=30))
    assert bool(rm.converged)
    swr = Schwarz(A, SchwarzOptions(variant="ras"))
    rr = gmres(op, b, M=swr.precond,
               opts=GMRESOptions(tol=1e-8, max_iter=200, k_dim=30))
    # multiplicative beats (or ties) RAS under the same Krylov
    assert int(rm.num_iterations) <= int(rr.num_iterations)


def test_schwarz_agglomerated_domains():
    """Graph-agglomerated Schwarz domains (schwarz.c
    hypre_AMGCreateDomainDof domain_type-2 role: each domain = one
    connectivity aggregate, overlap = its A-neighbor ring).  All three
    variants converge under GMRES; domains really follow the graph
    (every domain's rows are mutually connected through the aggregate
    core, unlike contiguous row slabs)."""
    import jax.numpy as jnp

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.ops.dia import freeze_auto, spmv
    from hypre_tpu.solvers.amg.schwarz import Schwarz, SchwarzOptions
    from hypre_tpu.solvers.krylov import GMRESOptions, gmres

    A = laplacian_7pt(10, 10, 10)
    b = jnp.asarray(A.to_scipy() @ np.ones(1000))
    E = freeze_auto(A)
    mv = lambda x: spmv(E, x)
    its = {}
    for var in ("ras", "additive", "multiplicative"):
        sw = Schwarz(A, SchwarzOptions(
            domain="agglomerate", variant=var, overlap=1))
        sw.attach(mv)
        r = gmres(mv, b, M=sw.precond,
                  opts=GMRESOptions(tol=1e-8, max_iter=200, k_dim=50))
        assert bool(r.converged), var
        its[var] = int(r.num_iterations)
    # aggregates follow connectivity: fewer iterations than the
    # contiguous-slab RAS needs under the same protocol
    assert max(its.values()) < 40
