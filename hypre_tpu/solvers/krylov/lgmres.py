"""LGMRES — GMRES augmented with error-approximation vectors.

Reference: krylov/lgmres.c (k_dim default 20 at :80... hypre ships 5 for
plain GMRES; LGMRES pairs k_dim with aug_dim=2 :101).  Per restart the
basis holds it_arnoldi = k_dim - aug_ct Krylov directions of A∘M plus
aug_ct stored directions a_aug = (A∘M)·z for the last aug_dim cycle
corrections z (lgmres.c:513-560); the combined correction w (Krylov p's
+ aug z's, :635-662) becomes the next aug vector BEFORE preconditioning
(:665), and x += M(w) (:668-672).

Static-shape TPU version: the Arnoldi loop always runs k_dim masked
steps; augmented columns are selected per step with lax.cond-free
where-masking, the aug registry is a fixed [aug_dim, ...] ring.
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
class LGMRESOptions:
    tol: float = 1e-6
    a_tol: float = 0.0
    max_iter: int = 1000
    k_dim: int = 20
    aug_dim: int = 2


def lgmres(
    A: Callable[[Vec], Vec],
    b: Vec,
    x0: Optional[Vec] = None,
    M: Optional[Callable[[Vec], Vec]] = None,
    opts: LGMRESOptions = LGMRESOptions(),
) -> SolverResult:
    M = M or identity_precond
    x0 = tzeros_like(b) if x0 is None else x0
    kd = int(opts.k_dim)
    ad = int(opts.aug_dim)
    max_iter = int(opts.max_iter)
    dtype = jnp.result_type(*jax.tree.leaves(b))

    b_norm = tnorm2(b)
    r0 = tsub(b, A(x0))
    r0_norm = tnorm2(r0)
    den = jnp.where(b_norm > 0, b_norm, r0_norm)
    epsilon = jnp.maximum(opts.a_tol, opts.tol * den)

    norms0 = jnp.full(max_iter + 1, jnp.nan, dtype=dtype).at[0].set(r0_norm)

    AUGZ0 = _stack_zeros(b, ad)  # stored corrections z (pre-precond space)
    AUGA0 = _stack_zeros(b, ad)  # their A∘M images
    init = (
        jnp.asarray(0),
        x0,
        r0,
        r0_norm,
        (r0_norm <= epsilon) | (r0_norm == 0.0),
        (r0_norm <= epsilon),
        norms0,
        AUGZ0,
        AUGA0,
        jnp.asarray(0),  # aug_ct
    )

    def cycle_cond(st):
        return (st[0] < max_iter) & (~st[4])

    def cycle_body(st):
        it0, x, r, r_norm, done, converged, norms, AUGZ, AUGA, aug_ct = st
        it_arnoldi = kd - aug_ct  # traced; masked per-step below

        V = _stack_zeros(b, kd + 1)
        V = _set(V, 0, tscale(1.0 / jnp.where(r_norm > 0, r_norm, 1.0), r))
        H = jnp.zeros((kd + 1, kd), dtype=dtype)
        cs = jnp.zeros(kd, dtype=dtype)
        sn = jnp.zeros(kd, dtype=dtype)
        rs = jnp.zeros(kd + 1, dtype=dtype).at[0].set(r_norm)

        def arnoldi(i, carry):
            V, H, cs, sn, rs, i_used, est, norms, active = carry

            def step(V, H, cs, sn, rs, i_used, est, norms):
                is_aug = i >= it_arnoldi
                aug_slot = jnp.clip(i - it_arnoldi, 0, ad - 1)
                w_k = A(M(_get(V, i)))
                w_a = _get(AUGA, aug_slot)
                w = jax.tree.map(
                    lambda a_, k_: jnp.where(is_aug, a_, k_), w_a, w_k
                )

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
                return V2, H2, cs2, sn2, rs2, i + 1, est2, norms2

            out = jax.tree.map(
                lambda a, b_: jnp.where(active, a, b_),
                step(V, H, cs, sn, rs, i_used, est, norms),
                (V, H, cs, sn, rs, i_used, est, norms),
            )
            V, H, cs, sn, rs, i_used, est, norms = out
            it_total = it_arnoldi + jnp.minimum(aug_ct, ad)
            active = (
                active
                & (est > epsilon)
                & (it0 + i_used < max_iter)
                & (i_used < it_total)
            )
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

        # correction w: Krylov columns (< it_arnoldi) use V, augmented
        # ones use stored z's
        col = jnp.arange(kd)
        y_kry = jnp.where(col < it_arnoldi, y, 0.0)
        w = jax.tree.map(lambda vs: jnp.tensordot(y_kry, vs[:kd], axes=1), V)
        aug_used = jnp.minimum(aug_ct, ad)
        y_aug = jnp.where(
            (col >= it_arnoldi) & (col < it_arnoldi + aug_used), y, 0.0
        )
        # shift aug coefs to slots 0..ad-1
        coef = jnp.zeros(ad, dtype)
        coef = lax.fori_loop(
            0,
            ad,
            lambda j, c: c.at[j].set(
                jnp.where(j < aug_used, y_aug[jnp.clip(it_arnoldi + j, 0, kd - 1)], 0.0)
            ),
            coef,
        )
        w = jax.tree.map(
            lambda wv, zs: wv + jnp.tensordot(coef, zs, axes=1), w, AUGZ
        )

        x = jax.tree.map(jnp.add, x, M(w))
        r = tsub(b, A(x))
        r_norm = tnorm2(r)
        it = it0 + i_used
        norms = norms.at[it].set(r_norm)
        converged = r_norm <= epsilon
        done = converged | (i_used == 0) | (it >= max_iter)

        # store new aug pair (ring position aug_ct % ad)
        wn = tnorm2(w)
        z_new = tscale(1.0 / jnp.where(wn > 0, wn, 1.0), w)
        Az_new = A(M(z_new))
        slot = aug_ct % ad
        AUGZ = jax.tree.map(
            lambda zs, zn: zs.at[slot].set(zn), AUGZ, z_new
        )
        AUGA = jax.tree.map(
            lambda qs, qn: qs.at[slot].set(qn), AUGA, Az_new
        )
        aug_ct = jnp.minimum(aug_ct + 1, jnp.asarray(ad))

        return (it, x, r, r_norm, done, converged, norms, AUGZ, AUGA, aug_ct)

    st = lax.while_loop(cycle_cond, cycle_body, init)
    it, x, r, r_norm, done, converged, norms = st[:7]
    return SolverResult(
        x=x,
        num_iterations=it,
        rel_residual_norm=r_norm / jnp.where(den > 0, den, 1.0),
        converged=converged,
        res_norms=norms,
    )
