"""BiCGSTAB.

Reference: krylov/bicgstab.c:233-540 — right-preconditioned (precond then
matvec, :424-425, :439-440), convergence on ||r||_2 <= max(a_tol,
r_tol*||b||) with a true-residual double check before declaring victory
(:467-476), gamma 0/0 -> 0 breakdown handling (:443-447), cf_tol
convergence-factor early exit (:489-498).

One jitted lax.while_loop; 2 matvecs + 2 preconds + 5 dots per iteration.
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

_EPSMAC = 1e-128  # bicgstab.c epsmac


@dataclasses.dataclass(frozen=True)
class BiCGSTABOptions:
    tol: float = 1e-6
    a_tol: float = 0.0
    max_iter: int = 1000
    min_iter: int = 0
    cf_tol: float = 0.0


def bicgstab(
    A: Callable[[Vec], Vec],
    b: Vec,
    x0: Optional[Vec] = None,
    M: Optional[Callable[[Vec], Vec]] = None,
    opts: BiCGSTABOptions = BiCGSTABOptions(),
) -> SolverResult:
    M = M or identity_precond
    x0 = tzeros_like(b) if x0 is None else x0
    max_iter = int(opts.max_iter)
    dtype = jnp.result_type(*jax.tree.leaves(b))

    r0 = tsub(b, A(x0))
    b_norm = tnorm2(b)
    r_norm0 = tnorm2(r0)
    den = jnp.where(b_norm > 0, b_norm, r_norm0)
    epsilon = jnp.maximum(opts.a_tol, opts.tol * den)

    norms0 = jnp.full(max_iter + 1, jnp.nan, dtype=dtype)
    norms0 = norms0.at[0].set(r_norm0)

    res0 = tdot(r0, r0)  # res = <r0, r>, initially <r0,r0>

    # state: (iter, x, r, p, res, r_norm, done, converged, cf_ave, norms)
    init = (
        jnp.asarray(0),
        x0,
        r0,
        r0,
        res0,
        r_norm0,
        (r_norm0 == 0.0) | (r_norm0 <= epsilon),
        (r_norm0 <= epsilon),
        jnp.asarray(0.0, dtype),
        norms0,
    )

    def cond(st):
        return (st[0] < max_iter) & (~st[6])

    def body(st):
        it, x, r, p, res, r_norm, done, converged, cf_ave_1, norms = st
        it = it + 1

        v = M(p)
        q = A(v)
        temp = tdot(r0, q)
        breakdown1 = jnp.abs(temp) < _EPSMAC
        alpha = res / jnp.where(breakdown1, 1.0, temp)
        x = taxpy(alpha, v, x)
        r = taxpy(-alpha, q, r)

        v2 = M(r)
        s = A(v2)
        g_num = tdot(r, s)
        g_den = tdot(s, s)
        gamma = jnp.where((g_num == 0.0) & (g_den == 0.0), 0.0, g_num / jnp.where(g_den == 0, 1.0, g_den))
        x = taxpy(gamma, v2, x)
        r = taxpy(-gamma, s, r)

        r_norm = tnorm2(r)
        norms = norms.at[it].set(r_norm)

        # convergence with true-residual double check (bicgstab.c:467-476);
        # lax.cond so the extra matvec only runs when tentatively converged
        tentative = (r_norm <= epsilon) & (it >= opts.min_iter)
        r, r_norm = lax.cond(
            tentative,
            lambda xr: (lambda rt: (rt, tnorm2(rt)))(tsub(b, A(xr[0]))),
            lambda xr: (xr[1], r_norm),
            (x, r),
        )
        conv_now = tentative & (r_norm <= epsilon)

        stop_cf = jnp.asarray(False)
        if opts.cf_tol > 0.0:
            cf_ave_0 = cf_ave_1
            cf_ave_1 = (r_norm / jnp.where(r_norm0 > 0, r_norm0, 1.0)) ** (
                1.0 / (2.0 * it)
            )
            weight = jnp.abs(cf_ave_1 - cf_ave_0) / jnp.maximum(
                jnp.maximum(cf_ave_1, cf_ave_0), _EPSMAC
            )
            stop_cf = (1.0 - weight) * cf_ave_1 > opts.cf_tol

        # beta = (res_new/res_old)(alpha/gamma); p = r + beta (p - gamma q)
        breakdown2 = (jnp.abs(res) < _EPSMAC) | (jnp.abs(gamma) < _EPSMAC)
        res_new = tdot(r0, r)
        beta = (res_new / jnp.where(res == 0, 1.0, res)) * (
            alpha / jnp.where(gamma == 0, 1.0, gamma)
        )
        p = taxpy(beta, taxpy(-gamma, q, p), r)
        res = res_new

        converged = converged | conv_now
        done = done | conv_now | breakdown1 | breakdown2 | stop_cf
        return (it, x, r, p, res, r_norm, done, converged, cf_ave_1, norms)

    st = lax.while_loop(cond, body, init)
    it, x, r, p, res, r_norm, done, converged, cf_ave_1, norms = st
    rel = r_norm / jnp.where(den > 0, den, 1.0)
    return SolverResult(
        x=x,
        num_iterations=it,
        rel_residual_norm=rel,
        converged=converged,
        res_norms=norms,
    )
