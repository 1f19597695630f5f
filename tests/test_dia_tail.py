"""Hybrid DIA + COOTail forms: exactness of the frequency split.

The tail moves entries on rare diagonals of the relocated lattice forms
into a gather/segment-sum/scatter side structure (ops/dia.py COOTail);
the represented operator must be bit-for-bit the same set of (row, col,
val) triples, so hybrid and pure-DIA matvecs agree to rounding and a
tailed relocated hierarchy converges identically to an untailed one.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import (
    DIAWithTail,
    build_embedded_dia,
    build_parity_interp,
    build_parity_restrict,
    relocate_to_cells,
    spmv,
)
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg


def _random_embedded(rng, npts, n_emb, density=12):
    """Sparse operator on npts points embedded at distinct positions."""
    pos = np.sort(rng.choice(n_emb, size=npts, replace=False))
    rows = rng.integers(0, npts, size=npts * density)
    cols = np.clip(rows + rng.integers(-40, 41, size=rows.size), 0, npts - 1)
    vals = rng.standard_normal(rows.size)
    M = sp.csr_matrix((vals, (rows, cols)), shape=(npts, npts))
    return M, pos


def test_embedded_tail_matvec_exact():
    rng = np.random.default_rng(3)
    M, pos = _random_embedded(rng, 700, 4096)
    x = rng.standard_normal(4096)
    plain = build_embedded_dia(M, pos, pos, 4096, np.float64)
    hybrid = build_embedded_dia(M, pos, pos, 4096, np.float64, tail_min=30)
    assert isinstance(hybrid, DIAWithTail)
    assert len(hybrid.dia.offsets) < len(plain.offsets)
    assert hybrid.tail.nnz > 0
    y0 = np.asarray(spmv(plain, jnp.asarray(x)))
    y1 = np.asarray(spmv(hybrid, jnp.asarray(x)))
    np.testing.assert_allclose(y1, y0, rtol=1e-12, atol=1e-12)


def test_parity_tail_matvec_exact():
    rng = np.random.default_rng(5)
    shape, factors = (16, 16, 16), (1, 2, 2)
    ncells = 16 * 8 * 8
    npts = 500
    # interp-like M: fine lattice rows, point cols
    pts_pos = np.sort(rng.choice(16**3, size=npts, replace=False))
    ccol = relocate_to_cells(pts_pos, shape, factors)
    rows = rng.integers(0, 16**3, size=3000)
    cols = rng.integers(0, npts, size=3000)
    vals = rng.standard_normal(3000)
    M = sp.csr_matrix((vals, (rows, cols)), shape=(16**3, npts))
    Mf = sp.csr_matrix(
        (M.tocoo().data, (M.tocoo().row, M.tocoo().col)), shape=(16**3, npts)
    )
    P0 = build_parity_interp(Mf, ccol, shape, factors, np.float64)
    P1 = build_parity_interp(Mf, ccol, shape, factors, np.float64, tail_min=4)
    assert P1.tail is not None
    xc = np.zeros(ncells)
    xc[ccol] = rng.standard_normal(npts)
    y0 = np.asarray(spmv(P0, jnp.asarray(xc)))
    y1 = np.asarray(spmv(P1, jnp.asarray(xc)))
    np.testing.assert_allclose(y1, y0, rtol=1e-12, atol=1e-12)

    R0 = build_parity_restrict(Mf.T.tocsr(), ccol, shape, factors, np.float64)
    R1 = build_parity_restrict(
        Mf.T.tocsr(), ccol, shape, factors, np.float64, tail_min=4
    )
    assert R1.tail is not None
    xf = rng.standard_normal(16**3)
    z0 = np.asarray(spmv(R0, jnp.asarray(xf)))
    z1 = np.asarray(spmv(R1, jnp.asarray(xf)))
    np.testing.assert_allclose(z1, z0, rtol=1e-12, atol=1e-12)


@pytest.mark.slow  # ~40 s; parity_tail_matvec_exact keeps fast coverage
def test_tailed_hierarchy_same_iterations():
    nx = 24
    n = nx**3
    A = laplacian_7pt(nx, nx, nx)
    b = jnp.asarray(A.to_scipy() @ np.ones(n))
    common = dict(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18, dtype="float64",
        relocate_min_n2=0, lattice_shape=(nx, nx, nx),
    )
    off = BoomerAMG(A, BoomerAMGOptions(**common, relocate_tail=False))
    on = BoomerAMG(A, BoomerAMGOptions(**common, relocate_tail=True))
    sols = []
    for m in (off, on):
        op = lambda x, E=m.levels[0].A: spmv(E, x)
        sols.append(pcg(op, b, M=m.precond,
                        opts=PCGOptions(tol=1e-8, max_iter=100)))
    assert int(sols[0].num_iterations) == int(sols[1].num_iterations)
    np.testing.assert_allclose(
        np.asarray(sols[0].x), np.asarray(sols[1].x), atol=1e-9
    )
