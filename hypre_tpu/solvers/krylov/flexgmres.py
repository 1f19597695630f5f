"""Flexible GMRES.

Reference: krylov/flexgmres.c — like restarted GMRES but the
preconditioner may change per iteration: the preconditioned vectors
z_j = M_j v_j are STORED and the correction is x += sum y_j z_j (no
final preconditioner application).  k_dim default 5.
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
from .gmres import _get, _set, _stack_zeros


@dataclasses.dataclass(frozen=True)
class FlexGMRESOptions:
    tol: float = 1e-6
    a_tol: float = 0.0
    max_iter: int = 1000
    k_dim: int = 5


def flexgmres(
    A: Callable[[Vec], Vec],
    b: Vec,
    x0: Optional[Vec] = None,
    M: Optional[Callable[[Vec], Vec]] = None,
    opts: FlexGMRESOptions = FlexGMRESOptions(),
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
        Z = _stack_zeros(b, kd)  # stored preconditioned vectors
        V = _set(V, 0, tscale(1.0 / jnp.where(r_norm > 0, r_norm, 1.0), r))
        H = jnp.zeros((kd + 1, kd), dtype=dtype)
        cs = jnp.zeros(kd, dtype=dtype)
        sn = jnp.zeros(kd, dtype=dtype)
        rs = jnp.zeros(kd + 1, dtype=dtype).at[0].set(r_norm)

        def arnoldi(i, carry):
            V, Z, H, cs, sn, rs, i_used, est, norms, active = carry

            def step(V, Z, H, cs, sn, rs, i_used, est, norms):
                z = M(_get(V, i))
                Z2 = _set(Z, i, z)
                w = A(z)

                def mgs(j, wh):
                    w, hcol = wh
                    hij = tdot(_get(V, j), w)
                    return (taxpy(-hij, _get(V, j), w), hcol.at[j].set(hij))

                w, hcol = lax.fori_loop(0, i + 1, mgs, (w, jnp.zeros(kd + 1, dtype)))
                t = tnorm2(w)
                hcol = hcol.at[i + 1].set(t)
                V2 = _set(V, i + 1, tscale(1.0 / jnp.where(t > 0, t, 1.0), w))

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
                return V2, Z2, H2, cs2, sn2, rs2, i + 1, est2, norms2

            out = jax.tree.map(
                lambda a, b_: jnp.where(active, a, b_),
                step(V, Z, H, cs, sn, rs, i_used, est, norms),
                (V, Z, H, cs, sn, rs, i_used, est, norms),
            )
            V, Z, H, cs, sn, rs, i_used, est, norms = out
            active = active & (est > epsilon) & (it0 + i_used < max_iter)
            return (V, Z, H, cs, sn, rs, i_used, est, norms, active)

        V, Z, H, cs, sn, rs, i_used, est, norms, _ = lax.fori_loop(
            0,
            kd,
            arnoldi,
            (V, Z, H, cs, sn, rs, jnp.asarray(0), r_norm, norms, jnp.asarray(True)),
        )

        def back(jj, y):
            j = kd - 1 - jj
            sub = jnp.dot(H[j, :], y)
            hjj = jnp.where(H[j, j] != 0, H[j, j], 1.0)
            yj = jnp.where(j < i_used, (rs[j] - sub) / hjj, 0.0)
            return y.at[j].set(yj)

        y = lax.fori_loop(0, kd, back, jnp.zeros(kd, dtype))

        # x += sum y_j Z_j (flexible: no second precond application)
        dx = jax.tree.map(lambda zstack: jnp.tensordot(y, zstack, axes=1), Z)
        x = jax.tree.map(jnp.add, x, dx)

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
