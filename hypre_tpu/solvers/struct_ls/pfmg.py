"""PFMG — semicoarsening multigrid for structured grids.

Reference: struct_ls/pfmg_setup.c (hypre_PFMGSetup:63 — dxyz-driven
coarsening-direction choice :215-233, level Jacobi weights 2/(3-alpha),
skip-relax active flags), pfmg_setup_interp.c (stencil-collapse interp:
center = sum of entries with zero cdir-offset, left/right = -sum of
entries with cdir-offset -/+1, weights left/center, right/center),
pfmg_setup_rap*.c (Galerkin RAP; computed here as exact P^T A P via the
host sparse form and folded back to stencil form), pfmg_solve.c (V-cycle
with convergence test at the top of each iteration), pfmg_relax.c /
point_relax.c (weighted Jacobi, relax_type 1 default).

TPU design: setup on host (numpy/scipy, once), solve phase fully jitted:
each level's residual/relax is one fused stencil kernel; restriction and
interpolation are 1-D gather/scatter ops along the level's cdir.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...struct.grid import StructGrid
from ...struct.matrix import StructMatrix, struct_matvec
from ..krylov.common import SolverResult

REAL_MAX = 1.7976931348623157e308


@dataclasses.dataclass(frozen=True)
class PFMGOptions:
    tol: float = 1e-6
    max_iter: int = 200
    max_levels: int = 0  # 0 = automatic
    relax_type: int = 1  # 1 = weighted Jacobi (default); 0 = w=1 Jacobi
    jacobi_weight: float = 0.0  # user weight if > 0
    num_pre_relax: int = 1
    num_post_relax: int = 1
    skip_relax: int = 1
    rel_change: bool = False
    zero_guess: bool = True
    dxyz: tuple | None = None  # user-supplied grid spacings


@dataclasses.dataclass
class _Level:
    A: StructMatrix
    dinv: jax.Array
    cdir: int  # -1 on coarsest
    active: bool
    weight: float
    p_lo: Optional[jax.Array] = None  # interp weights at odd fine points
    p_hi: Optional[jax.Array] = None
    red_mask: Optional[jax.Array] = None  # parity coloring (relax 2/3)


def _compute_dxyz(A: StructMatrix):
    """hypre_PFMGComputeDxyz: per-dim coupling strengths ->
    dxyz[d] = sqrt(cxyz_max / cxyz[d]); also the variation flag."""
    data = np.asarray(A.data)
    ndim = data.ndim - 1
    acc = A.diagonal()
    diag_sign = np.where(np.asarray(acc) < 0, -1.0, 1.0)
    n = data[0].size
    cxyz = np.zeros(3)
    sqcxyz = np.zeros(3)
    for d in range(ndim):
        tc = np.zeros(data.shape[1:])
        for k, off in enumerate(A.offsets):
            if off[d] != 0:
                tc += data[k]
        tc = -diag_sign * tc
        cxyz[d] = tc.sum()
        sqcxyz[d] = (tc * tc).sum()
    mean = cxyz / n
    dev = sqcxyz / n
    dxyz_flag = False
    for d in range(ndim):
        var = dev[d] - mean[d] ** 2
        if mean[d] != 0 and var / (mean[d] ** 2) > 0.1:
            dxyz_flag = True
            break
    cmax = max(cxyz.max(), 0.0) or 1.0
    dxyz = np.empty(3)
    for d in range(3):
        if cxyz[d] > 0:
            dxyz[d] = np.sqrt(cmax / cxyz[d])
        else:
            dxyz[d] = REAL_MAX / 1000
    return dxyz, dxyz_flag


def _collapse_interp(A: StructMatrix, cdir: int):
    """Stencil-collapse interp weights at every fine point
    (pfmg_setup_interp.c CC0): returned arrays are sampled at odd
    cdir-index points by the caller."""
    data = np.asarray(A.data)
    center = np.zeros(data.shape[1:])
    left = np.zeros(data.shape[1:])
    right = np.zeros(data.shape[1:])
    for k, off in enumerate(A.offsets):
        if off[cdir] == 0:
            center += data[k]
        elif off[cdir] < 0:
            left -= data[k]
        else:
            right -= data[k]
    safe = np.where(center == 0, 1.0, center)
    p_lo = np.where(center == 0, 0.0, left / safe)
    p_hi = np.where(center == 0, 0.0, right / safe)
    return p_lo, p_hi


def _take_axis(a, idx, axis):
    sl = [slice(None)] * a.ndim
    sl[axis] = idx
    return a[tuple(sl)]


def _build_P(shape, cdir, p_lo, p_hi):
    """Host sparse P: fine grid -> coarse grid (even cdir indices keep
    identity; odd interpolate from the two flanking coarse points)."""
    import scipy.sparse as sp

    nf = shape[cdir]
    nc = (nf + 1) // 2
    cshape = list(shape)
    cshape[cdir] = nc
    cshape = tuple(cshape)

    grids = np.indices(shape)
    rows = np.ravel_multi_index(grids, shape).ravel()
    ci = grids[cdir]

    rows_l, cols_l, vals_l = [], [], []

    # even points: identity
    even = (ci % 2 == 0).ravel()
    tgt = [g.copy() for g in grids]
    tgt[cdir] = ci // 2
    cols = np.ravel_multi_index(tgt, cshape).ravel()
    rows_l.append(rows[even])
    cols_l.append(cols[even])
    vals_l.append(np.ones(int(even.sum())))

    # odd points: p_lo to lower coarse, p_hi to upper coarse
    odd = (ci % 2 == 1).ravel()
    lo = [g.copy() for g in grids]
    lo[cdir] = np.clip((ci - 1) // 2, 0, nc - 1)
    cols_lo = np.ravel_multi_index(lo, cshape).ravel()
    rows_l.append(rows[odd])
    cols_l.append(cols_lo[odd])
    vals_l.append(p_lo.ravel()[odd])

    hi_idx = (ci + 1) // 2
    valid_hi = (hi_idx < nc).ravel() & odd
    hi = [g.copy() for g in grids]
    hi[cdir] = np.clip(hi_idx, 0, nc - 1)
    cols_hi = np.ravel_multi_index(hi, cshape).ravel()
    rows_l.append(rows[valid_hi])
    cols_l.append(cols_hi[valid_hi])
    vals_l.append(p_hi.ravel()[valid_hi])

    n = int(np.prod(shape))
    m = int(np.prod(cshape))
    P = sp.coo_matrix(
        (np.concatenate(vals_l), (np.concatenate(rows_l), np.concatenate(cols_l))),
        shape=(n, m),
    ).tocsr()
    return P, cshape


class PFMG:
    def __init__(self, A: StructMatrix, opts: PFMGOptions = PFMGOptions()):
        self.opts = opts
        self.levels: list[_Level] = []
        # setup scans .data per stencil entry; expand constant entries
        self._setup(A.densify())

    # ------------------------------------------------------------------
    def _setup(self, A0: StructMatrix) -> None:
        o = self.opts
        ndim = len(A0.shape)
        shape = tuple(A0.shape)

        max_levels = 1 + sum(int(np.log2(max(s, 1))) + 2 for s in shape)
        if o.max_levels > 0:
            max_levels = min(max_levels, o.max_levels)

        if o.dxyz is not None and all(d > 0 for d in o.dxyz[:ndim]):
            dxyz = np.array(list(o.dxyz) + [0.0] * (3 - len(o.dxyz)))
            dxyz_flag = False
        else:
            dxyz, dxyz_flag = _compute_dxyz(A0)

        A = A0
        coarsen_prev = np.ones(3, dtype=bool)  # forces relax on finest
        sizes = list(shape) + [1] * (3 - ndim)

        for l in range(max_levels):
            # choose cdir (pfmg_setup.c:215-233)
            min_dxyz = dxyz[0] + dxyz[1] + dxyz[2] + 1
            cdir = -1
            alpha = 0.0
            for d in range(ndim):
                if sizes[d] > 1 and dxyz[d] < min_dxyz:
                    min_dxyz = dxyz[d]
                    cdir = d
                alpha += 1.0 / (dxyz[d] * dxyz[d])
            weight = 1.0
            if cdir != -1:
                if dxyz_flag:
                    weight = 2.0 / 3.0
                else:
                    beta = sum(
                        1.0 / (dxyz[d] * dxyz[d]) for d in range(ndim) if d != cdir
                    )
                    frac = 0.0 if beta == alpha else beta / alpha
                    weight = 2.0 / (3.0 - frac) if ndim > 1 else 2.0 / 3.0
                if l == max_levels - 1:
                    cdir = -1
                # periodic-odd guard
                if cdir != -1 and A.periodic[cdir] and A.periodic[cdir] % 2:
                    cdir = -1

            if o.relax_type == 0:
                weight = 1.0
            elif o.jacobi_weight > 0:
                weight = o.jacobi_weight

            if cdir == -1:
                self.levels.append(self._freeze(A, -1, True, weight))
                break

            active = bool(coarsen_prev[cdir])
            if not o.skip_relax:
                active = True
            if active:
                coarsen_prev[:] = False
            coarsen_prev[cdir] = True

            # interp weights at odd points
            p_lo_full, p_hi_full = _collapse_interp(A, cdir)
            nf = A.shape[cdir]
            odd_idx = np.arange(1, nf, 2)
            p_lo = _take_axis(p_lo_full, odd_idx, cdir)
            p_hi = _take_axis(p_hi_full, odd_idx, cdir)

            P, cshape = _build_P(tuple(A.shape), cdir, p_lo_full, p_hi_full)
            M = A.to_scipy()
            Ac_sp = (P.T.tocsr() @ M @ P).tocsr()
            Ac = StructMatrix.from_scipy(Ac_sp, cshape, A.periodic)

            self.levels.append(
                self._freeze(A, cdir, active, weight, p_lo, p_hi)
            )
            dxyz[cdir] *= 2
            sizes[cdir] = (sizes[cdir] + 1) // 2
            A = Ac

    def _freeze(self, A, cdir, active, weight, p_lo=None, p_hi=None) -> _Level:
        diag = np.asarray(A.diagonal())
        dinv = np.where(diag == 0, 0.0, 1.0 / np.where(diag == 0, 1.0, diag))
        red = None
        if self.opts.relax_type in (2, 3):
            idx = sum(np.meshgrid(*[np.arange(s) for s in A.shape], indexing="ij"))
            red = jnp.asarray((idx % 2) == 0)
        return _Level(
            A=A,
            dinv=jnp.asarray(dinv),
            cdir=cdir,
            active=active,
            weight=float(weight),
            p_lo=None if p_lo is None else jnp.asarray(p_lo),
            p_hi=None if p_hi is None else jnp.asarray(p_hi),
            red_mask=red,
        )

    @property
    def num_levels(self):
        return len(self.levels)

    # ------------------------------------------------------------------
    # device ops
    # ------------------------------------------------------------------
    def _relax(self, lvl: _Level, x, b, sweeps: int, zero_guess: bool):
        if self.opts.relax_type in (2, 3):
            from .relax import red_black_gs

            for s in range(sweeps):
                if zero_guess and s == 0:
                    x = jnp.where(lvl.red_mask, lvl.dinv * b, 0.0)
                    r = b - struct_matvec(lvl.A, x)
                    x = jnp.where(~lvl.red_mask, lvl.dinv * r, x)
                else:
                    x = red_black_gs(lvl.A, lvl.dinv, x, b, lvl.red_mask)
            return x
        w = lvl.weight
        for s in range(sweeps):
            if zero_guess and s == 0:
                x = w * lvl.dinv * b
            else:
                r = b - struct_matvec(lvl.A, x)
                x = x + w * lvl.dinv * r
        return x

    def _restrict(self, lvl: _Level, r):
        """b_c = P^T r along cdir (semi_restrict.c)."""
        a = lvl.cdir
        nf = r.shape[a]
        nc = (nf + 1) // 2
        no = nf // 2
        r_even = _take_axis_j(r, jnp.arange(0, nf, 2), a)
        r_odd = _take_axis_j(r, jnp.arange(1, nf, 2), a)
        lo_term = lvl.p_lo * r_odd  # contributes to coarse k (k = 0..no-1)
        hi_term = lvl.p_hi * r_odd  # contributes to coarse k+1
        bc = r_even
        bc = bc.at[_axslice(bc.ndim, a, 0, no)].add(lo_term)
        # hi contributions to k+1 (drop k+1 == nc overflow)
        nhi = min(no, nc - 1)
        bc = bc.at[_axslice(bc.ndim, a, 1, 1 + nhi)].add(
            hi_term[_axslice(bc.ndim, a, 0, nhi)]
        )
        return bc

    def _interp_add(self, lvl: _Level, x, e_c):
        """x += P e_c (semi_interp.c)."""
        a = lvl.cdir
        nf = x.shape[a]
        nc = (nf + 1) // 2
        no = nf // 2
        x = x.at[_axstride(x.ndim, a, 0, 2)].add(e_c)
        e_lo = e_c[_axslice(x.ndim, a, 0, no)]
        # upper coarse neighbor of odd k is k+1 (ghost zero at the end)
        pad = [(0, 0)] * x.ndim
        pad[a] = (0, max(0, no + 1 - nc))
        e_hi = jnp.pad(e_c, pad)[_axslice(x.ndim, a, 1, no + 1)]
        x = x.at[_axstride(x.ndim, a, 1, 2)].add(lvl.p_lo * e_lo + lvl.p_hi * e_hi)
        return x

    def _vcycle(self, b):
        """One full V-cycle sweep given the level rhs; returns x."""
        o = self.opts
        L = self.num_levels
        lvls = self.levels

        def down(l, bl):
            lvl = lvls[l]
            if l == L - 1:
                return self._relax(lvl, jnp.zeros_like(bl), bl, 1, True)
            if lvl.active:
                x = self._relax(lvl, jnp.zeros_like(bl), bl, o.num_pre_relax, True)
            else:
                x = jnp.zeros_like(bl)
            r = bl - struct_matvec(lvl.A, x)
            bc = self._restrict(lvl, r)
            ec = down(l + 1, bc)
            x = self._interp_add(lvl, x, ec)
            if lvl.active:
                x = self._relax(lvl, x, bl, o.num_post_relax, False)
            return x

        return down(1, b) if L > 1 else None

    def cycle(self, f, u=None):
        """One V-cycle with zero initial guess — the preconditioner hook
        (one pfmg_solve.c iteration without the convergence plumbing)."""
        o = self.opts
        lvl0 = self.levels[0]
        zero_guess = u is None
        u = jnp.zeros_like(f) if u is None else u
        u = self._relax(lvl0, u, f, o.num_pre_relax, zero_guess)
        r = f - struct_matvec(lvl0.A, u)
        if self.num_levels > 1:
            ec = self._vcycle(self._restrict(lvl0, r))
            u = self._interp_add(lvl0, u, ec)
        u = self._relax(lvl0, u, f, o.num_post_relax, False)
        return u

    @property
    def precond(self):
        return lambda r: self.cycle(r)

    # ------------------------------------------------------------------
    def solve(self, b, x0=None) -> SolverResult:
        """pfmg_solve.c iteration structure: pre-relax L0, residual +
        convergence check, descend/ascend, post-relax L0."""
        o = self.opts
        lvl0 = self.levels[0]
        x = jnp.zeros_like(b) if x0 is None else x0

        b_dot_b = jnp.vdot(b, b)
        eps = o.tol**2
        dtype = b.dtype
        max_iter = o.max_iter
        norms = jnp.full(max_iter + 1, jnp.nan, dtype=dtype)

        L = self.num_levels

        def cycle_body(st):
            i, x, rr, done, norms, zg = st
            x = jax.lax.cond(
                zg,
                lambda x: self._relax(lvl0, x, b, o.num_pre_relax, True),
                lambda x: self._relax(lvl0, x, b, o.num_pre_relax, False),
                x,
            )
            r = b - struct_matvec(lvl0.A, x)
            rr = jnp.vdot(r, r)
            norms = norms.at[i].set(jnp.sqrt(rr))
            conv = (rr / jnp.where(b_dot_b > 0, b_dot_b, 1.0) < eps) & (i > 0)
            done = conv | (b_dot_b == 0.0)

            def do_cycle(args):
                x, r = args
                if L > 1:
                    bc = self._restrict(lvl0, r)
                    ec = self._vcycle(bc)
                    x = self._interp_add(lvl0, x, ec)
                x = self._relax(lvl0, x, b, o.num_post_relax, False)
                return x

            x = jax.lax.cond(done, lambda a: a[0], do_cycle, (x, r))
            return (i + 1, x, rr, done, norms, jnp.asarray(False))

        def cond(st):
            i, x, rr, done, norms, zg = st
            return (i < max_iter) & (~done)

        init = (
            jnp.asarray(0),
            x,
            jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False),
            norms,
            jnp.asarray(bool(o.zero_guess and x0 is None)),
        )
        i, x, rr, done, norms, _ = jax.lax.while_loop(cond, cycle_body, init)

        # hypre reports iterations = index of the converged check
        iters = jnp.where(done, i - 1, i)
        rel = jnp.sqrt(rr / jnp.where(b_dot_b > 0, b_dot_b, 1.0))
        return SolverResult(
            x=x,
            num_iterations=iters,
            rel_residual_norm=rel,
            converged=done,
            res_norms=norms,
        )


def _axslice(ndim, axis, start, stop):
    sl = [slice(None)] * ndim
    sl[axis] = slice(start, stop)
    return tuple(sl)


def _axstride(ndim, axis, start, step):
    sl = [slice(None)] * ndim
    sl[axis] = slice(start, None, step)
    return tuple(sl)


def _take_axis_j(a, idx, axis):
    return jnp.take(a, idx, axis=axis)
