"""CGNR — conjugate gradient on the normal equations.

Reference: krylov/cgnr.c — solves A^T A x = A^T b via CG; requires the
transpose matvec (MatvecT vtable slot) and applies the preconditioner
to A^T r.  Convergence on ||r||/||b|| with r = b - A x.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .common import (
    SolverResult,
    Vec,
    identity_precond,
    taxpy,
    tdot,
    tnorm2,
    tsub,
    tzeros_like,
)


@dataclasses.dataclass(frozen=True)
class CGNROptions:
    tol: float = 1e-6
    max_iter: int = 1000
    min_iter: int = 0


def cgnr(
    A: Callable[[Vec], Vec],
    AT: Callable[[Vec], Vec],
    b: Vec,
    x0: Optional[Vec] = None,
    M: Optional[Callable[[Vec], Vec]] = None,
    opts: CGNROptions = CGNROptions(),
) -> SolverResult:
    M = M or identity_precond
    x0 = tzeros_like(b) if x0 is None else x0
    max_iter = int(opts.max_iter)
    dtype = jnp.result_type(*jax.tree.leaves(b))

    b_norm = tnorm2(b)
    r0 = tsub(b, A(x0))
    r0_norm = tnorm2(r0)
    den = jnp.where(b_norm > 0, b_norm, jnp.where(r0_norm > 0, r0_norm, 1.0))

    q0 = M(AT(r0))  # preconditioned normal residual
    gamma0 = tdot(q0, q0)

    norms0 = jnp.full(max_iter + 1, jnp.nan, dtype=dtype).at[0].set(r0_norm)

    init = (
        jnp.asarray(0),
        x0,
        r0,
        q0,
        q0,  # p
        gamma0,
        r0_norm,
        (r0_norm / den < opts.tol),
        (r0_norm / den < opts.tol),
        norms0,
    )

    def cond(st):
        return (st[0] < max_iter) & (~st[7])

    def body(st):
        i, x, r, q, p, gamma, r_norm, done, converged, norms = st
        i = i + 1
        w = A(p)
        alpha = gamma / jnp.where(tdot(w, w) == 0, 1.0, tdot(w, w))
        x = taxpy(alpha, p, x)
        r = taxpy(-alpha, w, r)
        q = M(AT(r))
        gamma_new = tdot(q, q)
        beta = gamma_new / jnp.where(gamma == 0, 1.0, gamma)
        p = taxpy(beta, p, q)
        r_norm = tnorm2(r)
        norms = norms.at[i].set(r_norm)
        conv = (r_norm / den < opts.tol) & (i >= opts.min_iter)
        stall = gamma_new == 0.0
        return (i, x, r, q, p, gamma_new, r_norm, done | conv | stall, converged | conv, norms)

    st = lax.while_loop(cond, body, init)
    i, x, r, q, p, gamma, r_norm, done, converged, norms = st
    return SolverResult(
        x=x,
        num_iterations=i,
        rel_residual_norm=r_norm / den,
        converged=converged,
        res_norms=norms,
    )
