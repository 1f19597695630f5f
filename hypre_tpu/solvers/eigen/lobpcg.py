"""LOBPCG — locally optimal block preconditioned conjugate gradients.

Reference: krylov/lobpcg.c + multivector/ (the mv_InterfaceInterpreter
multivector vtable, interpreter.h:51; dense sub-eigenproblems via the
bundled LAPACK dsyev/dsygv in fortran_matrix.c).

TPU design: a multivector is an [n, m] array; every vtable operation
(MultiVecMat, MultiInnerProd, block axpy) is a single MXU matmul, and
the 3m x 3m Rayleigh-Ritz problem solves with jnp.linalg.eigh inside the
jit — the structure the reference built from function pointers and f2c
LAPACK collapses into a dozen fused XLA ops.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LOBPCGOptions:
    tol: float = 1e-6
    max_iter: int = 100


@dataclasses.dataclass
class LOBPCGResult:
    eigenvalues: jax.Array  # [m]
    eigenvectors: jax.Array  # [n, m]
    num_iterations: int
    residual_norms: jax.Array  # [m]
    converged: bool


def _b_orthonormalize(X, B):
    BX = B(X)
    gram = X.T @ BX
    # Cholesky-based orthonormalization (SVQB-lite)
    L = jnp.linalg.cholesky(gram)
    Xo = jax.scipy.linalg.solve_triangular(L, X.T, lower=True).T
    return Xo


def lobpcg(
    A: Callable,
    X0: jax.Array,
    B: Optional[Callable] = None,
    T: Optional[Callable] = None,
    opts: LOBPCGOptions = LOBPCGOptions(),
) -> LOBPCGResult:
    """Smallest m eigenpairs of A x = lambda B x.

    A, B, T are callables on [n, m] multivectors (columnwise); T is the
    preconditioner (applied to the residual block).
    """
    B = B or (lambda X: X)
    T = T or (lambda R: R)
    n, m = X0.shape

    X = _b_orthonormalize(X0, B)
    AX = A(X)
    gram = X.T @ AX
    theta, C = jnp.linalg.eigh((gram + gram.T) / 2)
    X = X @ C
    AX = AX @ C
    P = jnp.zeros_like(X)
    AP = jnp.zeros_like(X)

    resnorms = jnp.full(m, jnp.inf)
    it_done = 0
    converged = False

    # host loop (few iterations; each composite is jit-fused by XLA)
    for it in range(opts.max_iter):
        BX = B(X)
        R = AX - BX * theta[None, :]
        resnorms = jnp.linalg.norm(R, axis=0) / jnp.maximum(jnp.abs(theta), 1e-300)
        if bool(jnp.all(resnorms < opts.tol)):
            converged = True
            it_done = it
            break
        W = T(R)
        # soft locking: converged columns contribute no search direction
        # (their W is numerical noise that erodes block rank — lobpcg.c's
        # activeMask)
        active = (resnorms >= opts.tol)[None, :]
        W = jnp.where(active, W, 0.0)
        AW = A(W)
        X, AX, P, AP, theta = _rr_update(A, B, X, AX, W, AW, P, AP, m, it == 0)
        it_done = it + 1

    order = jnp.argsort(theta)
    return LOBPCGResult(
        eigenvalues=theta[order],
        eigenvectors=X[:, order],
        num_iterations=it_done,
        residual_norms=resnorms[order],
        converged=converged,
    )


def _rr_update(A, B, X, AX, W, AW, P, AP, m, first):
    """Rayleigh-Ritz over span[X, W, (P)] with rank-truncated B-whitening
    (the dsygv + ill-conditioning guards of lobpcg.c)."""
    # normalize the search blocks to tame the Gram conditioning
    wn = jnp.maximum(jnp.linalg.norm(W, axis=0, keepdims=True), 1e-300)
    W, AW = W / wn, AW / wn
    if not first:
        pn = jnp.maximum(jnp.linalg.norm(P, axis=0, keepdims=True), 1e-300)
        P, AP = P / pn, AP / pn
    S = jnp.concatenate([X, W] + ([] if first else [P]), axis=1)
    AS = jnp.concatenate([AX, AW] + ([] if first else [AP]), axis=1)
    BS = B(S)
    gA = S.T @ AS
    gB = S.T @ BS
    gA = (gA + gA.T) / 2
    gB = (gB + gB.T) / 2
    # rank-truncated whitening: drop near-dependent directions instead of
    # letting them poison the projected problem
    w, V = jnp.linalg.eigh(gB)
    keep = w > 1e-10 * jnp.max(w)
    wsafe = jnp.where(keep, w, 1.0)
    Binv_half = (V * jnp.where(keep, 1.0 / jnp.sqrt(wsafe), 0.0)[None, :])
    M = Binv_half.T @ gA @ Binv_half
    # dropped directions appear as zero rows/cols; push them to +inf so
    # they never rank among the smallest eigenpairs
    diag_mask = jnp.where(keep, 0.0, 1.0)
    M = M + jnp.diag(diag_mask * 1e30)
    theta, Z = jnp.linalg.eigh((M + M.T) / 2)
    C = Binv_half @ Z[:, :m]
    theta = theta[:m]

    Xn = S @ C
    AXn = AS @ C
    # P = component of the update outside X (classic LOBPCG recombination)
    Cp = C.at[:m, :].set(0.0)
    Pn = S @ Cp
    APn = AS @ Cp
    return Xn, AXn, Pn, APn, theta
