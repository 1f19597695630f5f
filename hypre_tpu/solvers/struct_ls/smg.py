"""SMG — semicoarsening multigrid with plane solves.

Reference: struct_ls/smg_setup.c (cdir always the last dim, :98),
smg_setup_interp.c (P stencil = +-1 in cdir; weights from solving the
masked plane systems hypre_SMGSetupInterpOp — A_mask keeps entries whose
cdir offset differs from the P entry's, x=1 elsewhere, relax the target
planes), smg_relax.c (relaxation = solving plane systems; hypre uses a
recursive (d-1)-dimensional SMG as the plane solver), smg_solve.c.

TPU design: small planes (<= 4096 points) are solved EXACTLY via
per-plane dense factorizations — each relax sweep is one batched
[nplanes, np, np] x [nplanes, np] matmul on the MXU, at least as strong
per iteration as the reference's inexact recursion.  Larger planes use
the reference's recursive structure, batched: a 2-D SMG over ALL planes
at once whose line systems are solved exactly with parallel cyclic
reduction (smg_plane.py; reference smg_relax.c + cyclic_reduction.c).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...struct.grid import StructGrid
from ...struct.matrix import StructMatrix, struct_matvec
from ..krylov.common import SolverResult
from .pfmg import _build_P  # reuse the semicoarsening P assembler

# largest plane (points) solved by precomputed dense inverses; beyond
# this the batched-2D recursive SMG takes over.  Dense storage is
# [nz, npl, npl] per level: 1024 keeps that <= 8 MB/plane-set, while
# 4096 (the round-2 value) would need 8.6 GB at 64^3.
_PLANE_DENSE_MAX = 1024


@dataclasses.dataclass(frozen=True)
class SMGOptions:
    tol: float = 1e-6
    max_iter: int = 200
    num_pre_relax: int = 1
    num_post_relax: int = 1
    max_levels: int = 0
    zero_guess: bool = True


@dataclasses.dataclass
class _Level:
    A: StructMatrix
    cdir: int
    planes: object  # _DensePlanes | _RecursivePlanes
    p_lo: Optional[jax.Array] = None
    p_hi: Optional[jax.Array] = None


class _DensePlanes:
    """Exact plane solves: batched dense inverses (planes <= 4096 pts)."""

    def __init__(self, inv: np.ndarray):
        self.inv = jnp.asarray(inv)

    def solve(self, rm, cycles: int = 1):
        return jnp.einsum("zij,zj->zi", self.inv, rm)


class _RecursivePlanes:
    """hypre's recursive plane solver, batched: one 2-D SMG V-cycle over
    all planes per relax (smg_relax.c)."""

    def __init__(self, A: StructMatrix, cdir: int):
        from .smg_plane import BatchedSMG2D

        shape = tuple(A.shape)
        self.pshape = tuple(s for d, s in enumerate(shape) if d != cdir)
        data = np.asarray(A.data)
        other = [d for d in range(len(shape)) if d != cdir]
        entries = {}
        for k, off in enumerate(A.offsets):
            if off[cdir] != 0:
                continue
            # batched [B, n_a1, n_a2] -> semicoarsen LAST remaining axis
            # (hypre 2-D cdir), lines along the first remaining axis:
            # BatchedSMG2D wants [B, coarse_dir, line_dir]
            arr = np.moveaxis(data[k], cdir, 0)
            entries[(int(off[other[1]]), int(off[other[0]]))] = np.ascontiguousarray(
                np.swapaxes(arr, 1, 2)
            )
        self.smg2 = BatchedSMG2D(entries)

    def solve(self, rm, cycles: int = 1):
        nz = rm.shape[0]
        r3 = rm.reshape((nz,) + self.pshape)          # [B, a1, a2]
        r3 = jnp.swapaxes(r3, 1, 2)                    # [B, a2, a1]
        x3 = self.smg2.solve(r3, cycles=cycles)
        return jnp.swapaxes(x3, 1, 2).reshape(nz, -1)


def _build_planes(A: StructMatrix, cdir: int):
    shape = tuple(A.shape)
    npl = int(np.prod([s for d, s in enumerate(shape) if d != cdir]))
    if npl > _PLANE_DENSE_MAX:
        return _RecursivePlanes(A, cdir)
    return _DensePlanes(_plane_inverses(A, cdir))


def _plane_inverses(A: StructMatrix, cdir: int) -> np.ndarray:
    """Dense inverse of each cdir-plane's in-plane system (entries with
    zero cdir offset)."""
    shape = tuple(A.shape)
    nz = shape[cdir]
    pshape = tuple(s for d, s in enumerate(shape) if d != cdir)
    npl = int(np.prod(pshape))
    data = np.asarray(A.data)
    inv = np.zeros((nz, npl, npl))
    # assemble each plane's 2D stencil matrix
    other = [d for d in range(len(shape)) if d != cdir]
    grids = np.indices(pshape)
    row_id = np.ravel_multi_index(grids, pshape).ravel()
    for z in range(nz):
        rows_l, cols_l, vals_l = [], [], []
        for k, off in enumerate(A.offsets):
            if off[cdir] != 0:
                continue
            tgt = [grids[i] + off[other[i]] for i in range(len(other))]
            ok = np.ones(pshape, dtype=bool)
            for i, t in enumerate(tgt):
                ok &= (t >= 0) & (t < pshape[i])
            col_id = np.ravel_multi_index(
                [np.clip(t, 0, s - 1) for t, s in zip(tgt, pshape)], pshape
            ).ravel()
            sl = [slice(None)] * len(shape)
            sl[cdir] = z
            vals = data[k][tuple(sl)].ravel()
            okf = ok.ravel()
            rows_l.append(row_id[okf])
            cols_l.append(col_id[okf])
            vals_l.append(vals[okf])
        M = sp.coo_matrix(
            (np.concatenate(vals_l), (np.concatenate(rows_l), np.concatenate(cols_l))),
            shape=(npl, npl),
        ).toarray()
        inv[z] = np.linalg.pinv(M, rcond=1e-13)
    return inv


def _smg_interp_weights(A: StructMatrix, cdir: int, planes):
    """P weights at every fine point via the masked plane solves
    (smg_setup_interp.c): for P entry with cdir offset o, solve the
    in-plane system against the SUM of couplings with cdir offset -o
    applied to ones."""
    shape = tuple(A.shape)
    nz = shape[cdir]
    pshape = tuple(s for d, s in enumerate(shape) if d != cdir)
    npl = int(np.prod(pshape))
    data = np.asarray(A.data)

    other = [d for d in range(len(shape)) if d != cdir]
    grids = np.indices(pshape)

    def inbounds_mask(off):
        """Couplings whose in-plane shifted target leaves the plane hit
        ghost zeros (the reference's relax-based solve sees this
        automatically; smg_setup_interp.c)."""
        ok = np.ones(pshape, dtype=bool)
        for i, d in enumerate(other):
            t = grids[i] + off[d]
            ok &= (t >= 0) & (t < pshape[i])
        return ok.ravel()

    out = {}
    for o in (-1, 1):
        # rhs = -(entries with cdir offset == -o), masked to in-plane bounds
        rhs = np.zeros((nz, npl))
        for k, off in enumerate(A.offsets):
            if off[cdir] == -o:
                mv = np.moveaxis(data[k], cdir, 0).reshape(nz, npl)
                rhs -= mv * inbounds_mask(off)[None, :]
        w = np.asarray(planes.solve(jnp.asarray(rhs), cycles=6))
        out[o] = np.moveaxis(w.reshape((nz,) + pshape), 0, cdir)
    # weight to the LOWER coarse donor comes from the -1-side response
    # (couplings with cdir offset -1), i.e. the o=+1 masked solve
    return out[1], out[-1]  # p_lo, p_hi


def _take(a, idx, axis):
    sl = [slice(None)] * a.ndim
    sl[axis] = idx
    return a[tuple(sl)]


class SMG:
    def __init__(self, A: StructMatrix, opts: SMGOptions = SMGOptions()):
        self.opts = opts
        self.levels: list[_Level] = []
        self._fns: dict = {}  # per-level compiled V-cycle pieces
        # setup scans .data per stencil entry; expand constant entries
        self._setup(A.densify())

    def _setup(self, A0: StructMatrix):
        o = self.opts
        A = A0
        ndim = len(A0.shape)
        cdir = ndim - 1  # smg_setup.c:98 — always the last dimension
        max_levels = int(np.log2(max(A0.shape[cdir], 1))) + 2
        if o.max_levels > 0:
            max_levels = min(max_levels, o.max_levels)

        for l in range(max_levels):
            planes = _build_planes(A, cdir)
            if A.shape[cdir] <= 1 or l == max_levels - 1:
                self.levels.append(_Level(A=A, cdir=cdir, planes=planes))
                break
            # interp weights at odd planes; hypre swaps lo/hi roles:
            # at fine plane 2k+1, weight to coarse k is the response from
            # the -1 side
            p_lo_full, p_hi_full = _smg_interp_weights(A, cdir, planes)
            nf = A.shape[cdir]
            odd = np.arange(1, nf, 2)
            p_lo = _take(p_lo_full, odd, cdir)
            p_hi = _take(p_hi_full, odd, cdir)

            P, cshape = _build_P(tuple(A.shape), cdir, p_lo_full, p_hi_full)
            M = A.to_scipy()
            Ac = StructMatrix.from_scipy((P.T.tocsr() @ M @ P).tocsr(), cshape, A.periodic)

            self.levels.append(
                _Level(
                    A=A,
                    cdir=cdir,
                    planes=planes,
                    p_lo=jnp.asarray(p_lo),
                    p_hi=jnp.asarray(p_hi),
                )
            )
            A = Ac

    @property
    def num_levels(self):
        return len(self.levels)

    # ------------------------------------------------------------------
    def _plane_solve_update(self, lvl: _Level, x, b, parity):
        """Solve the `parity` planes' systems exactly with current
        off-plane values (one half of the plane block-GS relax)."""
        a = lvl.cdir
        shape = x.shape
        nz = shape[a]
        r = b - struct_matvec(lvl.A, x)
        rm = jnp.moveaxis(r, a, 0).reshape(nz, -1)
        xm = jnp.moveaxis(x, a, 0).reshape(nz, -1)
        e = lvl.planes.solve(rm)
        idx = jnp.arange(nz)
        mask = (idx % 2 == parity)[:, None]
        xm = xm + jnp.where(mask, e, 0.0)
        x = jnp.moveaxis(
            xm.reshape((nz,) + tuple(s for d, s in enumerate(shape) if d != a)),
            0,
            a,
        )
        return x

    def _relax(self, lvl: _Level, x, b, sweeps: int, up: bool = False):
        """Plane block-GS over the two parity spaces; down sweeps use
        ranks (0,1), up sweeps (1,0) (smg_solve.c:213-214, 271-272)."""
        order = (1, 0) if up else (0, 1)
        for _ in range(sweeps):
            for par in order:
                x = self._plane_solve_update(lvl, x, b, par)
        return x

    def _restrict(self, lvl: _Level, r):
        a = lvl.cdir
        nf = r.shape[a]
        nc = (nf + 1) // 2
        no = nf // 2
        r_even = jnp.take(r, jnp.arange(0, nf, 2), axis=a)
        r_odd = jnp.take(r, jnp.arange(1, nf, 2), axis=a)
        lo = lvl.p_lo * r_odd
        hi = lvl.p_hi * r_odd
        bc = r_even
        sl = [slice(None)] * bc.ndim
        sl[a] = slice(0, no)
        bc = bc.at[tuple(sl)].add(lo)
        nhi = min(no, nc - 1)
        sl1 = [slice(None)] * bc.ndim
        sl1[a] = slice(1, 1 + nhi)
        sl2 = [slice(None)] * bc.ndim
        sl2[a] = slice(0, nhi)
        bc = bc.at[tuple(sl1)].add(hi[tuple(sl2)])
        return bc

    def _interp_add(self, lvl: _Level, x, ec):
        a = lvl.cdir
        nf = x.shape[a]
        nc = (nf + 1) // 2
        no = nf // 2
        sl_even = [slice(None)] * x.ndim
        sl_even[a] = slice(0, None, 2)
        x = x.at[tuple(sl_even)].add(ec)
        sl_lo = [slice(None)] * x.ndim
        sl_lo[a] = slice(0, no)
        e_lo = ec[tuple(sl_lo)]
        pad = [(0, 0)] * x.ndim
        pad[a] = (0, max(0, no + 1 - nc))
        sl_hi = [slice(None)] * x.ndim
        sl_hi[a] = slice(1, no + 1)
        e_hi = jnp.pad(ec, pad)[tuple(sl_hi)]
        sl_odd = [slice(None)] * x.ndim
        sl_odd[a] = slice(1, None, 2)
        x = x.at[tuple(sl_odd)].add(lvl.p_lo * e_lo + lvl.p_hi * e_hi)
        return x

    def _level_fns(self, l):
        """Per-level JITTED V-cycle pieces, cached.

        The round-2 formulation traced the ENTIRE multilevel recursion
        (every 3-D level x its batched-2D plane SMG) into one XLA
        program; at full depth that graph crashes XLA:CPU's compiler
        (stack overflow) and forced a max_levels clamp in the tests.
        hypre's own structure is per-level function calls
        (smg_solve.c:181-290) — mirroring that, each level compiles a
        handful of SMALL programs (residual, plane-set update,
        restrict, interp) and a host loop drives the cycle; the plane
        solves themselves (dense einsum or the batched-2D SMG, which is
        host-driven the same way) stay OUT of these graphs, so no
        program ever contains more than one level's stencil work."""
        fns = self._fns.get(l)
        if fns is not None:
            return fns
        lvl = self.levels[l]
        a = lvl.cdir

        @jax.jit
        def resid(x, b):
            return b - struct_matvec(lvl.A, x)

        @jax.jit
        def to_planes(r):
            return jnp.moveaxis(r, a, 0).reshape(r.shape[a], -1)

        @jax.jit
        def upd(x, e, parity):
            shape = x.shape
            nz = shape[a]
            xm = jnp.moveaxis(x, a, 0).reshape(nz, -1)
            mask = (jnp.arange(nz) % 2 == parity)[:, None]
            xm = xm + jnp.where(mask, e, 0.0)
            rest = tuple(s for d, s in enumerate(shape) if d != a)
            return jnp.moveaxis(xm.reshape((nz,) + rest), 0, a)

        fns = {"resid": resid, "to_planes": to_planes, "upd": upd}
        if l < self.num_levels - 1:
            @jax.jit
            def restrict_only(r):
                return self._restrict(lvl, r)

            @jax.jit
            def interp(x, ec):
                return self._interp_add(lvl, x, ec)

            fns["restrict"] = restrict_only
            fns["interp"] = interp
        self._fns[l] = fns
        return fns

    def _plane_update_host(self, l, x, b, parity):
        """One parity half of the plane block-GS, host-dispatched."""
        fns = self._level_fns(l)
        r = fns["resid"](x, b)
        e = self.levels[l].planes.solve(fns["to_planes"](r))
        return fns["upd"](x, e, parity)

    def _relax_host(self, l, x, b, sweeps, up=False):
        order = (1, 0) if up else (0, 1)
        for _ in range(int(sweeps)):
            for par in order:
                x = self._plane_update_host(l, x, b, par)
        return x

    def _vcycle(self, l, b):
        """Levels l..coarsest, driven from host over per-level programs."""
        o = self.opts
        fns = self._level_fns(l)
        if l == self.num_levels - 1:
            # coarsest: single plane set — exact plane solve
            x = self._plane_update_host(l, jnp.zeros_like(b), b, 0)
            return self._plane_update_host(l, x, b, 1)
        x = self._relax_host(l, jnp.zeros_like(b), b, o.num_pre_relax)
        ec = self._vcycle(l + 1, fns["restrict"](fns["resid"](x, b)))
        x = fns["interp"](x, ec)
        return self._relax_host(l, x, b, o.num_post_relax, up=True)

    def cycle(self, f, u=None):
        o = self.opts
        lvl0 = self.levels[0]
        u = jnp.zeros_like(f) if u is None else u
        u = self._relax(lvl0, u, f, o.num_pre_relax)
        r = f - struct_matvec(lvl0.A, u)
        if self.num_levels > 1:
            u = self._interp_add(lvl0, u, self._vcycle(1, self._restrict(lvl0, r)))
        u = self._relax(lvl0, u, f, o.num_post_relax, up=True)
        return u

    @property
    def precond(self):
        return lambda r: self.cycle(r)

    def solve(self, b, x0=None) -> SolverResult:
        """smg_solve.c iteration structure: pre-relax, residual +
        convergence check (i > 0), descend/ascend, post-relax."""
        o = self.opts
        lvl0 = self.levels[0]
        x = jnp.zeros_like(b) if x0 is None else x0
        b_dot_b = float(jnp.vdot(b, b))
        eps = o.tol**2
        norms = [float("nan")] * (o.max_iter + 1)
        rel = float("inf")
        converged = False
        it_done = 0

        fns0 = self._level_fns(0)

        @jax.jit
        def sqnorm(r):
            return jnp.vdot(r, r)

        for it in range(o.max_iter):
            x = self._relax_host(0, x, b, o.num_pre_relax)
            r = fns0["resid"](x, b)
            rr = float(sqnorm(r))
            norms[it] = float(np.sqrt(rr))
            rel = np.sqrt(rr / max(b_dot_b, 1e-300))
            it_done = it
            if rr / max(b_dot_b, 1e-300) < eps and it > 0:
                converged = True
                break
            if self.num_levels > 1:
                ec = self._vcycle(1, fns0["restrict"](r))
                x = fns0["interp"](x, ec)
            x = self._relax_host(0, x, b, o.num_post_relax, up=True)
        return SolverResult(
            x=x,
            num_iterations=jnp.asarray(it_done),
            rel_residual_norm=jnp.asarray(rel),
            converged=jnp.asarray(converged),
            res_norms=jnp.asarray(np.array(norms)),
        )
