"""Restarted GMRES.

Reference: krylov/gmres.c — right-preconditioned (precond applied before
the matvec, gmres.c:473-474, and once to the accumulated correction,
:663), modified Gram-Schmidt Arnoldi (:477-487), Givens rotations for the
least-squares problem, k_dim default 5 (:80), convergence on
||r||_2/||b||_2 with the true residual recomputed at each restart
(:677-678); if ||b|| = 0 the r0 norm is the denominator.

TPU design: one outer lax.while_loop per restart cycle; the k_dim Arnoldi
steps run as a masked lax.fori_loop (static trip count) so the whole
solver compiles to a single XLA program.  The Krylov basis is a stacked
pytree ([k_dim+1, ...] leading axis per leaf); the MGS projections are a
batched mass-dot (one fused reduction — the COGMRES-style batching comes
free from XLA fusion when leaves are 2D).
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
    tscale,
    tsub,
    tzeros_like,
)


@dataclasses.dataclass(frozen=True)
class GMRESOptions:
    tol: float = 1e-6
    a_tol: float = 0.0
    max_iter: int = 1000
    k_dim: int = 5


def _stack_zeros(x: Vec, k: int) -> Vec:
    return jax.tree.map(lambda a: jnp.zeros((k,) + a.shape, a.dtype), x)


def _get(stack: Vec, j) -> Vec:
    return jax.tree.map(lambda a: lax.dynamic_index_in_dim(a, j, 0, keepdims=False), stack)


def _set(stack: Vec, j, v: Vec) -> Vec:
    return jax.tree.map(
        lambda a, b: lax.dynamic_update_index_in_dim(a, b, j, 0), stack, v
    )


def gmres(
    A: Callable[[Vec], Vec],
    b: Vec,
    x0: Optional[Vec] = None,
    M: Optional[Callable[[Vec], Vec]] = None,
    opts: GMRESOptions = GMRESOptions(),
) -> SolverResult:
    M = M or identity_precond
    x0 = tzeros_like(b) if x0 is None else x0
    kd = int(opts.k_dim)
    max_iter = int(opts.max_iter)
    dtype = jnp.result_type(*jax.tree.leaves(b))

    b_norm = tnorm2(b)
    r0 = tsub(b, A(x0))
    r0_norm = tnorm2(r0)
    den = jnp.where(b_norm > 0, b_norm, r0_norm)
    epsilon = jnp.maximum(opts.a_tol, opts.tol * den)

    norms0 = jnp.full(max_iter + 1, jnp.nan, dtype=dtype)
    norms0 = norms0.at[0].set(r0_norm)

    # outer state: (iter, x, r, r_norm, done, converged, norms)
    init = (
        jnp.asarray(0),
        x0,
        r0,
        r0_norm,
        (r0_norm <= epsilon) | (r0_norm == 0.0),
        (r0_norm <= epsilon),
        norms0,
    )

    def cycle_cond(st):
        it, _, _, _, done, _, _ = st
        return (it < max_iter) & (~done)

    def cycle_body(st):
        it0, x, r, r_norm, done, converged, norms = st

        V = _stack_zeros(b, kd + 1)
        V = _set(V, 0, tscale(1.0 / jnp.where(r_norm > 0, r_norm, 1.0), r))
        H = jnp.zeros((kd + 1, kd), dtype=dtype)
        cs = jnp.zeros(kd, dtype=dtype)
        sn = jnp.zeros(kd, dtype=dtype)
        rs = jnp.zeros(kd + 1, dtype=dtype).at[0].set(r_norm)

        # inner Arnoldi steps, masked once the residual estimate converges
        # or max_iter is hit
        def arnoldi(i, carry):
            V, H, cs, sn, rs, i_used, est, norms, active = carry

            def step(V, H, cs, sn, rs, i_used, est, norms):
                w = A(M(_get(V, i)))
                # modified Gram-Schmidt (gmres.c:477-487)
                def mgs(j, wh):
                    w, hcol = wh
                    hij = tdot(_get(V, j), w)
                    w = taxpy(-hij, _get(V, j), w)
                    return (w, hcol.at[j].set(hij))

                w, hcol = lax.fori_loop(0, i + 1, mgs, (w, jnp.zeros(kd + 1, dtype)))
                t = tnorm2(w)
                hcol = hcol.at[i + 1].set(t)
                V2 = _set(V, i + 1, tscale(1.0 / jnp.where(t > 0, t, 1.0), w))

                # apply previous Givens rotations to the new column
                def rot(j, hc):
                    h0 = cs[j] * hc[j] + sn[j] * hc[j + 1]
                    h1 = -sn[j] * hc[j] + cs[j] * hc[j + 1]
                    return hc.at[j].set(h0).at[j + 1].set(h1)

                hcol = lax.fori_loop(0, i, rot, hcol)
                denom = jnp.sqrt(hcol[i] ** 2 + hcol[i + 1] ** 2)
                denom = jnp.where(denom > 0, denom, 1.0)
                ci, si = hcol[i] / denom, hcol[i + 1] / denom
                cs2, sn2 = cs.at[i].set(ci), sn.at[i].set(si)
                rs2 = rs.at[i + 1].set(-si * rs[i]).at[i].set(ci * rs[i])
                hcol = hcol.at[i].set(ci * hcol[i] + si * hcol[i + 1]).at[i + 1].set(0.0)
                H2 = H.at[:, i].set(hcol)
                est2 = jnp.abs(rs2[i + 1])
                norms2 = norms.at[it0 + i + 1].set(est2)
                return V2, H2, cs2, sn2, rs2, i + 1, est2, norms2

            out = jax.tree.map(
                lambda a, b_: jnp.where(active, a, b_),
                step(V, H, cs, sn, rs, i_used, est, norms),
                (V, H, cs, sn, rs, i_used, est, norms),
            )
            V, H, cs, sn, rs, i_used, est, norms = out
            active = active & (est > epsilon) & (it0 + i_used < max_iter)
            return (V, H, cs, sn, rs, i_used, est, norms, active)

        active0 = jnp.asarray(True)
        V, H, cs, sn, rs, i_used, est, norms, _ = lax.fori_loop(
            0,
            kd,
            arnoldi,
            (V, H, cs, sn, rs, jnp.asarray(0), r_norm, norms, active0),
        )

        # solve the (masked) upper-triangular system H y = rs
        def back(jj, y):
            j = kd - 1 - jj
            sub = jnp.dot(H[j, :], y)  # entries > j already hold y, others 0
            hjj = jnp.where(H[j, j] != 0, H[j, j], 1.0)
            yj = jnp.where(j < i_used, (rs[j] - sub) / hjj, 0.0)
            return y.at[j].set(yj)

        y = lax.fori_loop(0, kd, back, jnp.zeros(kd, dtype))

        # x += C (V y)   (right preconditioning, gmres.c:655-668)
        w = jax.tree.map(
            lambda vstack: jnp.tensordot(y, vstack[:kd], axes=1), V
        )
        x = jax.tree.map(jnp.add, x, M(w))

        # true residual at restart (gmres.c:677-678)
        r = tsub(b, A(x))
        r_norm = tnorm2(r)
        it = it0 + i_used
        norms = norms.at[it].set(r_norm)
        converged = r_norm <= epsilon
        # guard: no progress in a full cycle => stop (breakdown)
        stalled = (i_used == 0)
        done = converged | stalled | (it >= max_iter)
        return (it, x, r, r_norm, done, converged, norms)

    it, x, r, r_norm, done, converged, norms = lax.while_loop(
        cycle_cond, cycle_body, init
    )
    rel = r_norm / jnp.where(den > 0, den, 1.0)
    return SolverResult(
        x=x,
        num_iterations=it,
        rel_residual_norm=rel,
        converged=converged,
        res_norms=norms,
    )
