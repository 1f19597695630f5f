"""Sharded ParCSR matvec vs single-device (reference: the multi-np
agreement contract of the .saved regression files, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.models import laplacian_5pt_2d, laplacian_7pt, difconv_7pt
from hypre_tpu.parallel import ParCSR, make_mesh, par_dot
from hypre_tpu.solvers.krylov import PCGOptions, pcg


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


@pytest.mark.parametrize("nshards", [2, 4, 8])
def test_par_matvec_matches_serial(mesh8, nshards):
    mesh = make_mesh(nshards)
    A = laplacian_7pt(9, 7, 5)
    n = A.num_rows
    P = ParCSR(A, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    y = P.unpad(P.matvec(P.pad_vec(x)))
    np.testing.assert_allclose(y, A.to_scipy() @ x, rtol=1e-13)


def test_par_matvec_wide_coupling_allgather(mesh8):
    # dense-ish random matrix -> every shard needs every other:
    # falls back to the all_gather plan
    import scipy.sparse as sp
    from hypre_tpu.ops import CSRMatrix

    rng = np.random.default_rng(1)
    M = sp.random(64, 64, density=0.5, random_state=rng, format="csr")
    A = CSRMatrix.from_scipy(M)
    P = ParCSR(A, mesh8, max_offsets=2)
    assert P.plan.use_allgather
    x = rng.standard_normal(64)
    y = P.unpad(P.matvec(P.pad_vec(x)))
    np.testing.assert_allclose(y, M @ x, rtol=1e-12)


def test_par_matvec_uses_ppermute_for_banded(mesh8):
    A = laplacian_5pt_2d(16, 16)
    P = ParCSR(A, mesh8)
    assert not P.plan.use_allgather
    assert len(P.plan.offsets) <= 2  # banded: only +-1 neighbors


def test_par_pcg_matches_serial_iterations(mesh8):
    # same math on 1 and 8 shards -> same iteration count (the
    # smgbase3d.saved invariance contract)
    A = laplacian_7pt(8, 8, 8)
    n = A.num_rows
    b_host = np.ones(n)

    results = {}
    for ns in (1, 8):
        mesh = make_mesh(ns)
        P = ParCSR(A, mesh)
        b = P.pad_vec(b_host)
        res = pcg(P.matvec_fn, b, opts=PCGOptions(tol=1e-10, max_iter=200))
        results[ns] = (int(res.num_iterations), P.unpad(res.x))
    assert results[1][0] == results[8][0]
    np.testing.assert_allclose(results[1][1], results[8][1], rtol=1e-10)


def test_par_dot(mesh8):
    A = laplacian_5pt_2d(10, 10)
    P = ParCSR(A, mesh8)
    x = P.pad_vec(np.arange(100.0))
    assert float(par_dot(x, x)) == pytest.approx(float((np.arange(100.0) ** 2).sum()))
