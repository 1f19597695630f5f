"""COGMRES — communication-optimized GMRES.

Reference: krylov/cogmres.c — GMRES with classical Gram-Schmidt using
mass inner products (one batched reduction per Arnoldi step instead of
i+1 sequential ones, :516-533), optional CGS-2 reorthogonalization
(cgs=2), mass-axpy updates.  On TPU the mass dots are a single [k,n] x
[n] matmul -> one fused reduction (one psum when sharded) — this
solver's whole reason to exist maps perfectly to the hardware.
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
    tdot,
    tnorm2,
    tscale,
    tsub,
    tzeros_like,
)
from .gmres import _get, _set, _stack_zeros


@dataclasses.dataclass(frozen=True)
class COGMRESOptions:
    tol: float = 1e-6
    a_tol: float = 0.0
    max_iter: int = 1000
    k_dim: int = 5
    cgs: int = 1  # 2 = CGS-2 reorthogonalization


def _mass_dot(V: Vec, w: Vec, mask):
    """h_j = <V_j, w> for all j at once (masked beyond current size)."""
    parts = jax.tree.map(
        lambda vs, wv: jnp.tensordot(vs, wv, axes=wv.ndim), V, w
    )
    h = jax.tree.reduce(jnp.add, parts)
    return h * mask


def _mass_axpy(coefs, V: Vec, w: Vec):
    """w -= sum_j coefs[j] V_j (vector_batched.c mass-axpy analog)."""
    return jax.tree.map(
        lambda wv, vs: wv - jnp.tensordot(coefs, vs, axes=1), w, V
    )


def cogmres(
    A: Callable[[Vec], Vec],
    b: Vec,
    x0: Optional[Vec] = None,
    M: Optional[Callable[[Vec], Vec]] = None,
    opts: COGMRESOptions = COGMRESOptions(),
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

    norms0 = jnp.full(max_iter + 1, jnp.nan, dtype=dtype).at[0].set(r0_norm)

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
        return (st[0] < max_iter) & (~st[4])

    def cycle_body(st):
        it0, x, r, r_norm, done, converged, norms = st
        V = _stack_zeros(b, kd + 1)
        V = _set(V, 0, tscale(1.0 / jnp.where(r_norm > 0, r_norm, 1.0), r))
        H = jnp.zeros((kd + 1, kd), dtype=dtype)
        cs = jnp.zeros(kd, dtype=dtype)
        sn = jnp.zeros(kd, dtype=dtype)
        rs = jnp.zeros(kd + 1, dtype=dtype).at[0].set(r_norm)
        jidx = jnp.arange(kd + 1)

        def arnoldi(i, carry):
            V, H, cs, sn, rs, i_used, est, norms, active = carry

            def step(V, H, cs, sn, rs, i_used, est, norms):
                w = A(M(_get(V, i)))
                mask = (jidx <= i).astype(dtype)
                # classical GS with mass dots (one reduction)
                hcol = _mass_dot(V, w, mask)
                w = _mass_axpy(hcol, V, w)
                if opts.cgs > 1:  # CGS-2: one more batched pass
                    h2 = _mass_dot(V, w, mask)
                    w = _mass_axpy(h2, V, w)
                    hcol = hcol + h2
                t = tnorm2(w)
                hcol = hcol.at[i + 1].set(t)
                V2 = _set(V, i + 1, tscale(1.0 / jnp.where(t > 0, t, 1.0), w))

                def rot(j, hc):
                    h0 = cs[j] * hc[j] + sn[j] * hc[j + 1]
                    h1 = -sn[j] * hc[j] + cs[j] * hc[j + 1]
                    return hc.at[j].set(h0).at[j + 1].set(h1)

                hcol = lax.fori_loop(0, i, rot, hcol[: kd + 1])
                denom = jnp.sqrt(hcol[i] ** 2 + hcol[i + 1] ** 2)
                denom = jnp.where(denom > 0, denom, 1.0)
                ci, si = hcol[i] / denom, hcol[i + 1] / denom
                cs2, sn2 = cs.at[i].set(ci), sn.at[i].set(si)
                rs2 = rs.at[i + 1].set(-si * rs[i]).at[i].set(ci * rs[i])
                hcol = hcol.at[i].set(ci * hcol[i] + si * hcol[i + 1]).at[i + 1].set(0.0)
                H2 = H.at[:, i].set(hcol[: kd + 1])
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

        V, H, cs, sn, rs, i_used, est, norms, _ = lax.fori_loop(
            0,
            kd,
            arnoldi,
            (V, H, cs, sn, rs, jnp.asarray(0), r_norm, norms, jnp.asarray(True)),
        )

        def back(jj, y):
            j = kd - 1 - jj
            sub = jnp.dot(H[j, :], y)
            hjj = jnp.where(H[j, j] != 0, H[j, j], 1.0)
            yj = jnp.where(j < i_used, (rs[j] - sub) / hjj, 0.0)
            return y.at[j].set(yj)

        y = lax.fori_loop(0, kd, back, jnp.zeros(kd, dtype))
        w = jax.tree.map(lambda vs: jnp.tensordot(y, vs[:kd], axes=1), V)
        x = jax.tree.map(jnp.add, x, M(w))

        r = tsub(b, A(x))
        r_norm = tnorm2(r)
        it = it0 + i_used
        norms = norms.at[it].set(r_norm)
        converged = r_norm <= epsilon
        done = converged | (i_used == 0) | (it >= max_iter)
        return (it, x, r, r_norm, done, converged, norms)

    it, x, r, r_norm, done, converged, norms = lax.while_loop(
        cycle_cond, cycle_body, init
    )
    return SolverResult(
        x=x,
        num_iterations=it,
        rel_residual_norm=r_norm / jnp.where(den > 0, den, 1.0),
        converged=converged,
        res_norms=norms,
    )
