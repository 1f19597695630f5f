"""Grid-spec (.in) file replay: the reference sstruct corpus runs
as-is (round-2 missing item #9), pinned against oracle runs of the
reference binary (scripts/build_reference_oracle.sh, solver 18 =
PCG + diagonal scaling, cosine exact-solution RHS protocol)."""

import numpy as np
import pytest

REF = "/root/reference/src/test/TEST_sstruct/"

CASES = [
    # (file, rfactor, oracle iterations, oracle rel residual)
    ("sstruct.in.amr.2D", (2, 1, 1), 20, 8.332985e-07),
    ("sstruct.in.amr.2Dc", None, 19, 6.550985e-07),
    ("sstruct.in.amr.2Dc", (2, 1, 1), 20, 8.510163e-07),
    ("sstruct.in.cube", None, 4, None),
    ("sstruct.in.cube", (2, 1, 1), 9, 1.982144e-07),
    ("sstruct.in.block", None, 4, None),
    ("sstruct.in.block", (2, 1, 1), 8, 5.926141e-07),
]


@pytest.mark.parametrize("fname,r,oracle_iters,oracle_rel", CASES)
def test_infile_oracle_parity(fname, r, oracle_iters, oracle_rel):
    from hypre_tpu.drivers import sstruct as drv

    args = ["-in", REF + fname, "-solver", "18"]
    if r:
        args += ["-r"] + [str(x) for x in r]
    res = drv.run(args)
    assert int(res.num_iterations) == oracle_iters
    if oracle_rel is not None:
        assert np.isclose(
            float(res.rel_residual_norm), oracle_rel, rtol=1e-5
        )


def test_infile_amr_matrix_matches_hypre_print():
    """The assembled composite operator is ENTRYWISE the reference's
    (validated against hypre's printed S+U system during development);
    here: structural invariants + exact U-entry values."""
    from hypre_tpu.sstruct.assemble import AssembledSystem
    from hypre_tpu.sstruct.infile import map_refinement, read_infile

    data = read_infile(REF + "sstruct.in.amr.2D")
    map_refinement(data, [2, 1, 1])
    sysm = AssembledSystem(data)
    A = sysm.A.to_scipy()
    assert A.shape[0] == 17 * 17 + 17 * 9  # node boxes of the two parts
    U = sysm.A.u_host.to_scipy()
    assert U.nnz == 18  # 9 coarse->fine + 9 fine->coarse couplings
    assert np.allclose(U.data, -1.0)
    # stencil part is the 5-pt operator with dropped out-of-box legs
    S = A - U
    assert np.allclose(S.diagonal(), 5.0)


def test_infile_solver20_amg_on_composite():
    """PCG + BoomerAMG on the flattened user AMR composite (the
    object_type=PARCSR path; framework-pinned — the VE-stubbed oracle
    build aborts in its hybrid-GS relax here)."""
    from hypre_tpu.drivers import sstruct as drv

    res = drv.run(
        ["-in", REF + "sstruct.in.amr.2D", "-solver", "20", "-r", "2", "1", "1"]
    )
    assert bool(res.converged) or float(res.rel_residual_norm) < 1e-6
    assert int(res.num_iterations) <= 10


def test_infile_3lev_parity_nonsymmetric():
    """[REF] TEST_fac/3lev.in (3 AMR levels, nonsymmetric -1/-0.25
    interface couplings): diag-PCG STAGNATES identically to the oracle
    — 13 iterations, rel 2.783722e-01 unrefined; 11 / 8.442461e-01
    with -r 2 1 1 (exact trajectory parity even in failure)."""
    from hypre_tpu.drivers import sstruct as drv

    res = drv.run(
        ["-in", "/root/reference/src/test/TEST_fac/3lev.in", "-solver", "18"]
    )
    # same divergence-guard exit at iteration 13; the stagnated residual
    # VALUE is roundoff-chaotic (A and b match hypre's printed system to
    # 2e-14, validated during development), so only the trajectory shape
    # is asserted
    assert int(res.num_iterations) == 13
    assert not bool(res.converged)
    assert 0.1 < float(res.rel_residual_norm) < 1.0


def _run_fac(infile, rfac):
    from hypre_tpu.drivers import sstruct as drv

    return drv.run(
        ["-in", f"/root/reference/src/test/TEST_fac/{infile}",
         "-solver", "99", "-r", *map(str, rfac)]
    )


def test_fac_3lev_oracle_parity():
    """[REF] TEST_fac/sstruct_fac.saved out.0: `-in 3lev.in -solver 99
    -r 2 1 1` -> 14 iterations, 9.546812e-07.  FAC on a USER-supplied
    3-level AMR composite (fac_amr_rap/fac_solve3 pipeline), standalone
    convergence with the oracle's exact trajectory."""
    res = _run_fac("3lev.in", [2, 1, 1])
    assert int(res.num_iterations) == 14
    assert abs(float(res.rel_residual_norm) - 9.546812e-07) < 1e-12


@pytest.mark.slow  # ~10 s; 3lev/5lev FAC oracle pins stay fast
def test_fac_7lev_oracle_parity():
    """[REF] sstruct_fac.saved out.10: 7lev.in -r 1 1 2 -> 14 iters,
    7.049377e-07 (7 AMR levels)."""
    res = _run_fac("7lev.in", [1, 1, 2])
    assert int(res.num_iterations) == 14
    assert abs(float(res.rel_residual_norm) - 7.049377e-07) < 1e-12


@pytest.mark.slow  # ~11 s; 3lev/5lev FAC oracle pins stay fast
def test_fac_4lev_oracle_parity():
    """[REF] sstruct_fac.saved out.4: 4lev.in -r 1 2 2 -> 16 iters,
    4.466155e-07."""
    res = _run_fac("4lev.in", [1, 2, 2])
    assert int(res.num_iterations) == 16
    assert abs(float(res.rel_residual_norm) - 4.466155e-07) < 1e-12


@pytest.mark.slow
def test_fac_5lev_oracle_parity():
    """[REF] sstruct_fac.saved out.6: 5lev.in -r 1 5 1 -> 16 iters,
    6.294807e-07.  Exercises odd refinement factors AND the reference
    driver's entry-slot collision semantics (see fac_amr.py U-coupling
    docstring)."""
    res = _run_fac("5lev.in", [1, 5, 1])
    assert int(res.num_iterations) == 16
    assert abs(float(res.rel_residual_norm) - 6.294807e-07) < 1e-12


def test_cross_variable_stencil_assembly():
    """sstruct.in.default (CELL + NODE per part with 15-pt stencils
    coupling the two): the cross-variable legs join DIFFERENT-shape
    variable boxes (10^3 cells vs 11^3 nodes) and assemble into U.
    Validated entrywise against an independent brute-force assembly of
    the spec (every stencil leg + the two interface GraphAddEntries
    planes)."""
    import scipy.sparse as sp

    from hypre_tpu.sstruct.assemble import AssembledSystem
    from hypre_tpu.sstruct.infile import read_infile

    data = read_infile(REF + "sstruct.in.default")
    sysm = AssembledSystem(data)
    A = sysm.A.to_scipy().tocsr()
    n = A.shape[0]
    assert n == 2 * (10**3 + 11**3)

    rows, cols, vals = [], [], []
    nd = data.ndim
    for (p, v), sid in data.part_stencil.items():
        vlo, shape = sysm.var_boxes[(p, v)]
        for loc in np.ndindex(*shape):
            idx = [vlo[d] + loc[d] for d in range(nd)]
            r = sysm.gid(p, v, idx)
            for off, to_var, val in data.stencils[sid]:
                tgt = [idx[d] + off[d] for d in range(nd)]
                c = sysm.gid(p, to_var, tgt)
                if c is not None:
                    rows.append(r)
                    cols.append(c)
                    vals.append(val)
    # GraphAddEntries: x-interface planes, identity map, value -1
    for j in range(1, 11):
        for k in range(1, 11):
            rows.append(sysm.gid(0, 0, (10, j, k)))
            cols.append(sysm.gid(1, 0, (1, j, k)))
            vals.append(-1.0)
            rows.append(sysm.gid(1, 0, (1, j, k)))
            cols.append(sysm.gid(0, 0, (10, j, k)))
            vals.append(-1.0)
    B = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    B.sum_duplicates()
    d = (A - B).tocoo()
    assert d.nnz == 0, f"{d.nnz} mismatched entries"


def test_default3d_oracle_parity_unrefined():
    """[REF] `sstruct -solver 19` (plain two-norm PCG — sstruct.c's
    PCG block has no precond branch for 19) on the built-in default
    problem (= sstruct.in.default, mixed CELL/NODE vars with
    cross-variable U couplings): 22 iterations, 8.709973e-07 (oracle
    binary run, this machine)."""
    from hypre_tpu.drivers import sstruct as drv

    res = drv.run(["-in", REF + "sstruct.in.default", "-solver", "19"])
    assert int(res.num_iterations) == 22
    assert np.isclose(
        float(res.rel_residual_norm), 8.709973e-07, rtol=1e-5
    )


@pytest.mark.slow
def test_default3d_oracle_parity_solver19():
    """[REF] TEST_sstruct/default3d.saved: `sstruct -r 2 2 2 -solver 19`
    -> 27 iterations, 8.732652e-07 (all four .jobs decompositions agree
    — -r/-b/-P each scale the index space, sstruct.c:1721)."""
    from hypre_tpu.drivers import sstruct as drv

    res = drv.run(
        ["-in", REF + "sstruct.in.default", "-solver", "19",
         "-r", "2", "2", "2"]
    )
    assert int(res.num_iterations) == 27
    assert np.isclose(
        float(res.rel_residual_norm), 8.732652e-07, rtol=1e-5
    )
