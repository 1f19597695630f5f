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


def test_struct_pcg_pfmg():
    res = struct_driver.run("-n 10 10 10 -solver 11 -tol 1e-8".split())
    assert bool(res.converged)
    assert int(res.num_iterations) <= 12


def test_struct_dscg():
    res = struct_driver.run("-n 8 8 8 -solver 17 -tol 1e-8".split())
    assert bool(res.converged)


def test_sstruct_split_smg():
    from hypre_tpu.drivers import sstruct as sstruct_driver

    res = sstruct_driver.run("-n 6 6 6 -solver 19 -tol 1e-6".split())
    assert bool(res.converged)


def test_sstruct_pcg_split():
    from hypre_tpu.drivers import sstruct as sstruct_driver

    res = sstruct_driver.run("-n 6 6 6 -solver 11 -tol 1e-8".split())
    assert bool(res.converged)
    assert int(res.num_iterations) <= 30


def test_sstruct_syspfmg():
    from hypre_tpu.drivers import sstruct as sstruct_driver

    res = sstruct_driver.run("-n 8 8 8 -solver 3 -tol 1e-8".split())
    assert bool(res.converged)
