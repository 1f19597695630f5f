"""SpMV / ELL layout vs scipy (reference: seq_mv tests are driver-level;
here we unit-test against scipy as the oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from hypre_tpu.ops import CSRMatrix, ell_spmv
from hypre_tpu.ops.spmv import ell_matvec, ell_spmv_multi


def random_csr(n, m, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    M = sp.random(n, m, density=density, random_state=rng, format="csr")
    M.data = rng.standard_normal(M.nnz)
    return M


@pytest.mark.parametrize("n,m", [(1, 1), (7, 7), (100, 100), (65, 130), (128, 64)])
def test_ell_spmv_matches_scipy(n, m):
    M = random_csr(n, m, density=0.2, seed=n + m)
    A = CSRMatrix.from_scipy(M)
    x = np.random.default_rng(1).standard_normal(m)
    y = ell_spmv(A.to_ell(), jnp.asarray(x))[:n]
    np.testing.assert_allclose(np.asarray(y), M @ x, rtol=1e-12)


def test_empty_rows():
    M = sp.csr_matrix((5, 5))
    M[2, 3] = 4.0
    A = CSRMatrix.from_scipy(M.tocsr())
    x = np.arange(5.0)
    y = ell_spmv(A.to_ell(), jnp.asarray(x))[:5]
    np.testing.assert_allclose(np.asarray(y), M @ x)


def test_matvec_alpha_beta():
    M = random_csr(50, 50, seed=3)
    A = CSRMatrix.from_scipy(M).to_ell()
    rng = np.random.default_rng(2)
    x, b = rng.standard_normal(50), rng.standard_normal(50)
    y = ell_matvec(A, jnp.asarray(x), jnp.asarray(b), alpha=2.5, beta=-0.5)
    np.testing.assert_allclose(np.asarray(y), 2.5 * (M @ x) - 0.5 * b, rtol=1e-12)


def test_multivector():
    M = random_csr(40, 30, seed=4)
    A = CSRMatrix.from_scipy(M).to_ell()
    X = np.random.default_rng(5).standard_normal((30, 3))
    Y = ell_spmv_multi(A, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(Y), M @ X, rtol=1e-12)


def test_ell_jit_and_tree():
    # ELLMatrix must be a pytree usable as a jit argument.
    M = random_csr(20, 20, seed=6)
    A = CSRMatrix.from_scipy(M).to_ell()
    f = jax.jit(lambda A, x: ell_spmv(A, x)[:20])
    x = jnp.ones(20, dtype=A.data.dtype)
    np.testing.assert_allclose(np.asarray(f(A, x)), M @ np.ones(20), rtol=1e-12)


def test_roundtrip_coo():
    A = CSRMatrix.from_coo([0, 1, 1], [1, 0, 0], [1.0, 2.0, 3.0], (2, 2))
    # duplicates summed like IJ AddToValues
    assert A.to_scipy()[1, 0] == 5.0


# ---------------------------------------------------------------------------
# DIA formats (incl. the Pallas TPU kernel, run here in interpret mode)
# ---------------------------------------------------------------------------

def banded(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for o in offsets:
        i = np.arange(max(0, -o), min(n, n - o))
        rows.append(i)
        cols.append(i + o)
        vals.append(rng.standard_normal(len(i)))
    return sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    )


@pytest.mark.parametrize("n,offsets", [(300, (-17, -1, 0, 1, 17)), (64, (0, 3))])
def test_dia_spmv_matches_scipy(n, offsets):
    from hypre_tpu.ops.dia import csr_to_dia, dia_spmv

    M = banded(n, offsets, seed=n)
    A = csr_to_dia(CSRMatrix.from_scipy(M))
    x = np.random.default_rng(1).standard_normal(n)
    y = jax.jit(dia_spmv)(A, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), M @ x, rtol=1e-10)


def test_dia_padded_width_roundtrip():
    # freeze-time width padding (for the Pallas grid) must not change results
    from hypre_tpu.ops.dia import csr_to_dia, dia_spmv

    n = 500
    M = banded(n, (-25, 0, 25), seed=2)
    A = csr_to_dia(CSRMatrix.from_scipy(M))
    assert A.data.shape[1] >= n
    x = np.random.default_rng(3).standard_normal(n)
    y = dia_spmv(A, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), M @ x, rtol=1e-10)


@pytest.mark.parametrize("offsets", [(-320, -1, 0, 1, 320), (0, 3, 7, 100)])
def test_pallas_dia_interpret(offsets):
    """The TPU Pallas kernel, validated via interpret mode on CPU."""
    from hypre_tpu.ops.csr import CSRMatrix as C
    from hypre_tpu.ops.dia import csr_to_dia
    from hypre_tpu.ops.pallas_dia import pallas_dia_spmv

    n = 20000
    M = banded(n, offsets, seed=7)
    A = csr_to_dia(C.from_scipy(M), dtype=np.float32)
    x = np.random.default_rng(5).standard_normal(n).astype(np.float32)
    y = pallas_dia_spmv(A, jnp.asarray(x), interpret=True)
    ref = M @ x.astype(np.float64)
    err = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert err < 3e-6


def test_pallas_dia_interpret_bf16_data():
    """bfloat16 diagonal storage with f32 vectors (mat_dtype path)."""
    from hypre_tpu.ops.csr import CSRMatrix as C
    from hypre_tpu.ops.dia import csr_to_dia
    from hypre_tpu.ops.pallas_dia import pallas_dia_spmv

    n = 20000
    M = banded(n, (-320, -1, 0, 1, 320), seed=11)
    A = csr_to_dia(C.from_scipy(M), dtype=jnp.bfloat16)
    x = np.random.default_rng(5).standard_normal(n).astype(np.float32)
    y = pallas_dia_spmv(A, jnp.asarray(x), interpret=True)
    assert y.dtype == jnp.float32
    ref = M @ x.astype(np.float64)
    err = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert err < 2e-2  # bf16 entries: ~0.4% per-entry, stays small


def test_matops_bool_aat_fffc():
    """Pattern/AAt/FFFC matops (par_csr_bool_matop.c / par_csr_aat.c /
    gen_fffc.c roles)."""
    import scipy.sparse as sp

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.ops.matops import aat, bool_multiply, fffc_split

    A = laplacian_7pt(4, 4, 3).to_scipy()
    B = bool_multiply(A, A)
    assert set(np.unique(B.data)) == {1}
    # pattern of A@A
    assert (B != 0).nnz == ((A @ A) != 0).nnz

    C = aat(A)
    assert abs(C - A @ A.T).max() < 1e-12

    cf = np.where(np.arange(A.shape[0]) % 3 == 0, 1, -1)
    FF, FC, CF, CC = fffc_split(A, cf)
    nf, nc = (cf <= 0).sum(), (cf > 0).sum()
    assert FF.shape == (nf, nf) and CC.shape == (nc, nc)
    assert FC.shape == (nf, nc) and CF.shape == (nc, nf)
    assert FF.nnz + FC.nnz + CF.nnz + CC.nnz == A.nnz


def test_pallas_dia_chunked_interpret():
    """Wide-diagonal operators run as a sum of offset-chunked kernel
    calls; interpret mode checks the chunked path bit-for-bit against
    the dense product (noff > _CHUNK forces >= 3 chunks)."""
    import scipy.sparse as sp

    from hypre_tpu.ops import pallas_dia as pd

    rng = np.random.default_rng(7)
    n = 4096
    offs = np.unique(rng.integers(-400, 400, 130))
    data = rng.standard_normal((len(offs), n)).astype(np.float32)
    # mask out-of-range diagonal entries like csr_to_dia stores them
    rows = np.arange(n)
    for k, o in enumerate(offs):
        bad = (rows + o < 0) | (rows + o >= n)
        data[k, bad] = 0.0
    from hypre_tpu.ops.dia import DIAMatrix

    A = DIAMatrix(data=jnp.asarray(data), offsets=tuple(int(o) for o in offs),
                  num_rows=n, num_cols=n)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(pd.pallas_dia_spmv(A, jnp.asarray(x), interpret=True))
    # row-aligned reference: y[i] = sum_k data[k, i] * x[i + off_k]
    y_ref = np.zeros(n, np.float64)
    for k, o in enumerate(offs):
        lo_, hi_ = max(0, -o), min(n, n - o)
        y_ref[lo_:hi_] += data[k, lo_:hi_] * x[lo_ + o: hi_ + o]
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=1e-4)
