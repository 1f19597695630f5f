"""Regression suite replaying the reference's .jobs -> .saved pattern
(SURVEY §4): drivers run with the same CLI lines; iteration counts and
residual norms compared against committed baselines.

Baselines marked [REF] were produced by the sequential oracle build of
the reference (scripts/build_reference_oracle.sh); others pin this
framework's current behavior against regressions.
"""

import numpy as np
import pytest

from hypre_tpu.drivers import ij as ij_driver
from hypre_tpu.drivers import struct as struct_driver


@pytest.mark.slow
def test_ij_default_jobs():
    # [REF] TEST_ij/default.jobs: ij -pmis -Pmx 0 -rlx 0 -xisone
    # default.saved: 48 iterations, conv factor 0.678738
    res = ij_driver.run(
        "-pmis -Pmx 0 -rlx 0 -xisone -mxrs 1.0 -interptype 6".split()
    )
    assert int(res.num_iterations) == 48


def test_ij_amg_pcg():
    res = ij_driver.run("-n 8 8 8 -solver 1 -rlx 18 -tol 1e-8".split())
    assert bool(res.converged)
    assert int(res.num_iterations) <= 12


def test_ij_ds_gmres():
    res = ij_driver.run("-n 6 6 6 -solver 4 -tol 1e-8 -k 20".split())
    assert bool(res.converged)


def test_ij_27pt_gmres_hmis():
    # the BASELINE config #3 shape: 27-pt Laplacian, AMG-GMRES, HMIS+ext+i
    res = ij_driver.run(
        "-n 8 8 8 -27pt -solver 3 -hmis -interptype 6 -rlx 18 -tol 1e-8".split()
    )
    assert bool(res.converged)
    assert int(res.num_iterations) <= 12


def test_struct_pfmg_base3d():
    # [REF] TEST_struct/pfmgbase3d.saved: struct -n 12 12 12 -c 2.0 3.0 40
    # -solver 1 -> 10 iterations, rel res 3.298941e-07
    res = struct_driver.run("-n 12 12 12 -c 2.0 3.0 40 -solver 1".split())
    assert int(res.num_iterations) == 10
    assert float(res.rel_residual_norm) < 1e-6


@pytest.mark.slow  # PCG+PFMG compile-heavy; base3d/dscg driver pins keep fast coverage
def test_struct_pcg_pfmg():
    res = struct_driver.run("-n 10 10 10 -solver 11 -tol 1e-8".split())
    assert bool(res.converged)
    assert int(res.num_iterations) <= 12


def test_struct_dscg():
    res = struct_driver.run("-n 8 8 8 -solver 17 -tol 1e-8".split())
    assert bool(res.converged)


def test_sstruct_split_smg():
    from hypre_tpu.drivers import sstruct as sstruct_driver

    # reference id 0 = Split + SMG (sstruct.c:3708)
    res = sstruct_driver.run("-n 6 6 6 -solver 0 -tol 1e-6".split())
    assert bool(res.converged)


@pytest.mark.slow  # ~16 s; split fast coverage: test_sstruct_split_smg + test_sstruct.py
def test_sstruct_pcg_split():
    from hypre_tpu.drivers import sstruct as sstruct_driver

    res = sstruct_driver.run("-n 6 6 6 -solver 11 -tol 1e-8".split())
    assert bool(res.converged)
    assert int(res.num_iterations) <= 30


@pytest.mark.slow  # ~14 s; SysPFMG covered fast by tests/test_sys_pfmg.py
def test_sstruct_syspfmg():
    from hypre_tpu.drivers import sstruct as sstruct_driver

    res = sstruct_driver.run("-n 8 8 8 -solver 3 -tol 1e-8".split())
    assert bool(res.converged)


# ---------------------------------------------------------------------------
# Broadened corpus (round 2): reference .jobs lines replayed through the
# drivers.  [REF] = our output matches the committed .saved values from
# /root/reference/src/test/TEST_*;  [REF~] = reference value noted, ours
# pinned (difference explained inline).  The reference runs these at
# np in {1,...,8} and requires identical output across decompositions;
# our math is partition-invariant by construction (tests/test_par_amg.py)
# so one run stands for the set.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "args, ref_iters, ref_rel, exact",
    [
        # [REF] TEST_struct/smgbase2d.saved
        ("-n 12 12 1 -d 2 -solver 0", 5, 2.468039e-07, True),
        # [REF] TEST_struct/smgbase3d.saved
        ("-n 12 12 12 -c 2.0 3.0 40 -solver 0", 4, 8.971901e-07, True),
        # [REF] TEST_struct/pfmgbase3d.saved (iterations; final
        # residual 2.57e-07 vs 3.30e-07 — PFMG relax detail, see GAPS.md)
        ("-n 12 12 12 -c 2.0 3.0 40 -solver 1", 10, None, True),
        # [REF] TEST_struct/cgpfmg3d.saved (iterations; residual differs in
        # the last digits of the PFMG relaxation ordering)
        ("-n 12 12 12 -solver 11 -skip 1", 9, None, True),
        # [REF] TEST_struct/solvers.saved: SMG-PCG
        ("-solver 10", 4, None, True),
        # [REF] TEST_struct/solvers.saved: unpreconditioned PCG
        ("-solver 19", 20, 5.962015e-07, True),
        # [REF] TEST_struct/solvers.saved: DS-PCG (== plain PCG on the
        # constant-diagonal default Laplacian)
        ("-solver 18", 20, 5.962015e-07, True),
        # [REF~] TEST_struct/pfmgbase2d.saved says 13; our PFMG weighted-
        # Jacobi relaxation (relax 1) is slightly stronger serially: 11
        ("-n 12 12 1 -d 2 -solver 1 -relax 1", 11, None, True),
        # [REF~] TEST_struct/solvers.saved says 8; ours 7 (PFMG pre/post
        # ordering detail)
        ("-solver 11", 7, None, True),
        # [REF~] TEST_struct/solvers.saved says 20 for solver 17; our
        # literal two-sweep Jacobi preconditioner halves the count
        ("-solver 17", 11, None, True),
    ],
)
@pytest.mark.slow  # ~71 s over 6 oracle replays; base3d/pcg/dscg driver pins stay fast
def test_struct_jobs_corpus(args, ref_iters, ref_rel, exact):
    res = struct_driver.run(args.split())
    assert int(res.num_iterations) == ref_iters
    if ref_rel is not None:
        assert abs(float(res.rel_residual_norm) - ref_rel) < 2e-9


@pytest.mark.parametrize(
    "args, pin_iters, pin_cf, ref_cf",
    [
        # TEST_ij/coarsening.jobs (reference cf from np=4 runs whose
        # default hybrid-GS smoother is partition-dependent; ours is the
        # serial true-GS limit, slightly stronger -> smaller cf)
        ("-rhsrand -n 15 15 10 -interptype 0 -Pmx 0 -cljp -27pt", 8, 0.0832, 0.094028),
        ("-rhsrand -n 15 15 10 -interptype 0 -Pmx 0 -ruge -27pt", 9, 0.1052, 0.124105),
        ("-rhsrand -n 15 15 10 -interptype 0 -Pmx 0 -falgout -27pt", 9, 0.1052, 0.114604),
        ("-rhsrand -n 15 15 10 -pmis -27pt", 9, 0.1120, 0.126924),
        ("-rhsrand -n 15 15 10 -27pt", 9, 0.1120, 0.115880),
        # TEST_ij/interp.jobs shapes
        ("-rhsrand -n 15 15 10 -Pmx 0", 11, 0.1852, None),
        ("-rhsrand -n 15 15 10 -interptype 8 -Pmx 0", 11, 0.1853, None),
        ("-rhsrand -n 15 15 10 -interptype 0 -Pmx 0 -falgout", 10, 0.1444, None),
        # TEST_ij/solvers.jobs shapes (AMG-PCG / AMG-GMRES / AMG-BiCGSTAB)
        ("-solver 1 -rlx 18 -tol 1e-8 -n 10 10 10", 12, None, None),
        ("-solver 3 -rlx 18 -tol 1e-8 -n 10 10 10", 12, None, None),
        ("-solver 9 -rlx 18 -tol 1e-8 -n 10 10 10", 7, None, None),
    ],
)
def test_ij_jobs_corpus(args, pin_iters, pin_cf, ref_cf):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res = ij_driver.run(args.split())
    assert int(res.num_iterations) == pin_iters
    if pin_cf is not None:
        cf = None
        for line in buf.getvalue().splitlines():
            if "Convergence Factor" in line:
                cf = float(line.split("=")[-1])
        assert cf is not None and abs(cf - pin_cf) < 5e-4
