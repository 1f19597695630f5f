"""Preconditioned conjugate gradients.

Reference: krylov/pcg.c (solve loop :498-727).  Semantics reproduced:
  * energy-norm (<C r, r>) convergence test by default, two-norm option
  * eps = max(r_tol^2, a_tol^2 / <C b, b>)   (pcg.c:407)
  * zero-rhs short circuit (x = 0, 0 iterations, pcg.c:411-425)
  * rel_change test alpha^2 <p,p>/<x,x> < eps  (pcg.c:668-675)
  * recompute_residual / recompute_residual_p  (pcg.c:535-548, 641-664)
  * rtol residual-change test ||r_new - r_old|| < rtol ||b|| (pcg.c:551-585)
  * cf_tol convergence-factor early exit       (pcg.c:700-727)
  * subnormal alpha/gamma divergence guards    (pcg.c:522-528, 683-689)

TPU design: the whole solve is one jitted lax.while_loop; each iteration
does 1 matvec + 1 precond + 2 fused dots, the loop-carried state is a
flat pytree, and the residual history lands in a fixed [max_iter+1]
buffer so shapes stay static.
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
    tsub,
    tzeros_like,
)

_TINY = 2.2e-308  # HYPRE_REAL_MIN guard


@dataclasses.dataclass(frozen=True)
class PCGOptions:
    tol: float = 1e-6
    a_tol: float = 0.0
    max_iter: int = 1000
    two_norm: bool = False
    rel_change: bool = False
    recompute_residual: bool = False
    recompute_residual_p: int = 0
    rtol: float = 0.0  # residual-change stopping
    cf_tol: float = 0.0


def pcg(
    A: Callable[[Vec], Vec],
    b: Vec,
    x0: Optional[Vec] = None,
    M: Optional[Callable[[Vec], Vec]] = None,
    opts: PCGOptions = PCGOptions(),
) -> SolverResult:
    M = M or identity_precond
    x0 = tzeros_like(b) if x0 is None else x0
    max_iter = int(opts.max_iter)
    dtype = jnp.result_type(*jax.tree.leaves(b))

    # <C b, b> (or <b,b>): the normalization (pcg.c:358-366)
    Cb = M(b) if not opts.two_norm else b
    bi_prod = tdot(Cb, b)
    eps = jnp.maximum(opts.tol**2, opts.a_tol**2 / jnp.where(bi_prod > 0, bi_prod, 1.0))

    r0 = tsub(b, A(x0))
    p0 = M(r0)
    gamma0 = tdot(r0, p0)
    i_prod_0 = tdot(r0, r0) if opts.two_norm else gamma0

    norms0 = jnp.full(max_iter + 1, jnp.nan, dtype=dtype)
    norms0 = norms0.at[0].set(jnp.sqrt(i_prod_0))

    zero_rhs = ~(bi_prod > 0.0)

    # state: (i, x, r, p, gamma, i_prod, alpha, done, converged, cf_ave, norms)
    init = (
        jnp.asarray(0),
        x0,
        r0,
        p0,
        gamma0,
        i_prod_0,
        jnp.asarray(0.0, dtype),
        zero_rhs,  # done
        zero_rhs,  # converged (0-rhs counts as converged at 0 iters)
        jnp.asarray(0.0, dtype),  # cf_ave_1
        norms0,
    )

    def cond(state):
        i, done = state[0], state[7]
        return (i < max_iter) & (~done)

    def body(state):
        i, x, r, p, gamma, i_prod, _, done, converged, cf_ave_1, norms = state
        i = i + 1

        s = A(p)
        sdotp = tdot(s, p)
        alpha = gamma / jnp.where(sdotp == 0.0, 1.0, sdotp)
        bad = (sdotp == 0.0) | ~(alpha > _TINY)

        gamma_old = gamma
        x = taxpy(alpha, p, x)

        if opts.recompute_residual_p > 0:
            recompute = (i % opts.recompute_residual_p) == 0
            r = jax.tree.map(
                lambda rn, rt: jnp.where(recompute, rt, rn),
                taxpy(-alpha, s, r),
                tsub(b, A(x)),
            )
        else:
            r = taxpy(-alpha, s, r)

        # rtol residual-change test (two-norm form uses alpha^2 <s,s>)
        drob2 = (
            alpha * alpha * tdot(s, s) / bi_prod
            if (opts.rtol > 0 and opts.two_norm)
            else None
        )

        z = M(r)
        gamma = tdot(r, z)
        i_prod = tdot(r, r) if opts.two_norm else gamma

        norms = norms.at[i].set(jnp.sqrt(i_prod))

        tentatively = i_prod / jnp.where(bi_prod > 0, bi_prod, 1.0) < eps
        if opts.recompute_residual:
            r_true = tsub(b, A(x))
            ip_true = (
                tdot(r_true, r_true) if opts.two_norm else tdot(r_true, M(r_true))
            )
            # only trust recomputed residual when tentatively converged
            i_prod = jnp.where(tentatively, ip_true, i_prod)
            r = jax.tree.map(
                lambda rn, rt: jnp.where(tentatively, rt, rn), r, r_true
            )
            tentatively = i_prod / jnp.where(bi_prod > 0, bi_prod, 1.0) < eps
        if opts.rel_change:
            pi_prod = tdot(p, p)
            xi_prod = tdot(x, x)
            ratio = alpha * alpha * pi_prod / jnp.where(xi_prod > 0, xi_prod, 1.0)
            tentatively = tentatively & (ratio < eps)

        stop_rtol = jnp.asarray(False)
        if opts.rtol > 0:
            if opts.two_norm:
                stop_rtol = drob2 < opts.rtol**2
            else:
                stop_rtol = (gamma + gamma_old) / bi_prod < opts.rtol**2

        # cf_tol early exit (pcg.c:700-727)
        stop_cf = jnp.asarray(False)
        if opts.cf_tol > 0.0:
            cf_ave_0 = cf_ave_1
            cf_ave_1 = (i_prod / i_prod_0) ** (1.0 / (2.0 * i))
            weight = jnp.abs(cf_ave_1 - cf_ave_0) / jnp.maximum(
                jnp.maximum(cf_ave_1, cf_ave_0), _TINY
            )
            stop_cf = (1.0 - weight) * cf_ave_1 > opts.cf_tol

        diverged = ~(gamma > _TINY) & ~tentatively
        converged = converged | (tentatively & ~bad)
        done = done | tentatively | bad | diverged | stop_rtol | stop_cf

        beta = gamma / jnp.where(gamma_old == 0.0, 1.0, gamma_old)
        p = taxpy(beta, p, z)  # p = z + beta p

        return (i, x, r, p, gamma, i_prod, alpha, done, converged, cf_ave_1, norms)

    state = lax.while_loop(cond, body, init)
    i, x, r, p, gamma, i_prod, alpha, done, converged, cf_ave_1, norms = state

    # zero-rhs: hypre copies b (= 0) into x (pcg.c:411-425)
    x = jax.tree.map(lambda xv, bv: jnp.where(zero_rhs, bv, xv), x, b)

    rel = jnp.where(
        bi_prod > 0, jnp.sqrt(i_prod / jnp.where(bi_prod > 0, bi_prod, 1.0)), 0.0
    )
    return SolverResult(
        x=x,
        num_iterations=i,
        rel_residual_norm=rel,
        converged=converged,
        res_norms=norms,
    )
