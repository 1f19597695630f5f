"""Device-side strength + PMIS (par_coarsen_device.c analog): CF
decisions bit-identical to the host path via integer-exact
(count, lcg-state) measure comparisons."""

import numpy as np
import pytest

from hypre_tpu.models import difconv_7pt, laplacian_7pt
from hypre_tpu.ops.csr import CSRMatrix
from hypre_tpu.ops.dia import csr_to_dia
from hypre_tpu.solvers.amg.coarsen import pmis_coarsen
from hypre_tpu.solvers.amg.device_coarsen import (
    device_pmis, lattice_pmis_host, lcg_states_host,
)
from hypre_tpu.solvers.amg.strength import strength_matrix
from hypre_tpu.utils.lcg import M, lcg_fill


def test_lcg_states_match_values():
    st = lcg_states_host(2747, 1000, skip=13)
    vals = lcg_fill(2747, 1000, skip=13)
    np.testing.assert_allclose(st.astype(np.float64) / M, vals, rtol=0,
                               atol=0)


@pytest.mark.parametrize("builder", [
    lambda: laplacian_7pt(24, 24, 24),
    lambda: laplacian_7pt(20, 16, 12, cx=1.0, cy=5.0, cz=40.0),
    lambda: difconv_7pt(16, 16, 16, ax=4.0, ay=2.0, az=1.0),
])
def test_device_pmis_bitwise_matches_host(builder):
    A = builder()
    n = A.num_rows
    S = strength_matrix(A, 0.25, 0.9)
    cf_host = pmis_coarsen(S)
    D = csr_to_dia(A, device=False)
    cf_dev = np.asarray(device_pmis(D.data, D.offsets, n))
    np.testing.assert_array_equal(cf_dev.astype(np.int64), cf_host)
    # the numpy twin (the graded chain's PMIS — see boomeramg.py
    # _device_setup_level0) is bitwise the same marker as well
    cf_np = lattice_pmis_host(D.data, D.offsets, n)
    np.testing.assert_array_equal(cf_np.astype(np.int64), cf_host)


@pytest.mark.slow  # ~27 s; device PMIS bitwise parity is covered fast in test_device_setup
def test_boomeramg_device_coarsen_identical_hierarchy():
    """device_coarsen=True produces the IDENTICAL hierarchy (CF bitwise
    -> same level sizes, same operators) as the host path."""
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(16, 16, 16)
    common = dict(coarsen_type="pmis", interp_type="classical",
                  P_max_elmts=4, relax_down=18, relax_up=18,
                  lattice_shape=(16, 16, 16))
    h = BoomerAMG(A, BoomerAMGOptions(device_coarsen=False, **common))
    d = BoomerAMG(A, BoomerAMGOptions(device_coarsen=True, **common))
    assert h.num_levels == d.num_levels
    for lh, ld in zip(h._host_A, d._host_A):
        assert lh.shape == ld.shape
        assert abs(lh - ld).max() == 0.0
    np.testing.assert_array_equal(h._cf[0], d._cf[0])
