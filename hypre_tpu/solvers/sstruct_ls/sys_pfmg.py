"""SysPFMG — PFMG generalized to nvars-variable structured systems.

Reference: sstruct_ls/sys_pfmg*.c (7 files) + node_relax.c: the PFMG
skeleton (dxyz-driven semicoarsening, stencil-collapse interpolation,
Galerkin RAP) applied blockwise over variables, with nodewise block
relaxation (node_relax.c solves the nvars x nvars diagonal block at
every grid point).

TPU design: variable blocks as a dict {(vi,vj) -> StructMatrix} over a
shared grid; node relax = one batched [*, nvars, nvars] inverse applied
as an einsum; interpolation is block-diagonal per variable (each vi
collapses its own diagonal block, the sys_pfmg_setup_interp structure);
coarse operators via exact host Galerkin on the monolithic form.
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
from ..struct_ls.pfmg import _build_P, _collapse_interp, _compute_dxyz, REAL_MAX


@dataclasses.dataclass(frozen=True)
class SysPFMGOptions:
    tol: float = 1e-6
    max_iter: int = 200
    num_pre_relax: int = 1
    num_post_relax: int = 1
    max_levels: int = 0
    jacobi_weight: float = 0.8  # nodewise block-Jacobi damping


@dataclasses.dataclass
class _Level:
    blocks: dict  # (vi, vj) -> StructMatrix
    nvars: int
    cdir: int
    node_inv: jax.Array  # [*grid, nvars, nvars]
    p_lo: Optional[list] = None  # per-var odd-plane weights
    p_hi: Optional[list] = None


def _sys_matvec(blocks, nvars, xs):
    return tuple(
        sum(struct_matvec(blocks[(vi, vj)], xs[vj]) for vj in range(nvars)
            if (vi, vj) in blocks)
        for vi in range(nvars)
    )


class SysPFMG:
    def __init__(self, blocks: dict, grid: StructGrid,
                 opts: SysPFMGOptions = SysPFMGOptions()):
        self.opts = opts
        self.nvars = max(v for v, _ in blocks.keys()) + 1
        self.levels: list[_Level] = []
        self._setup(blocks, grid)

    # ------------------------------------------------------------------
    def _setup(self, blocks, grid):
        o = self.opts
        nvars = self.nvars
        ndim = grid.ndim
        shape = tuple(grid.shape)
        max_levels = 1 + sum(int(np.log2(max(s, 1))) + 2 for s in shape)
        if o.max_levels:
            max_levels = min(max_levels, o.max_levels)

        # dxyz from the sum over variables' diagonal blocks
        dxyz = np.zeros(3)
        cx = np.zeros(3)
        for v in range(nvars):
            dv, _ = _compute_dxyz(blocks[(v, v)])
            cx[:ndim] += 1.0 / np.maximum(dv[:ndim], 1e-300) ** 2
        dxyz[:ndim] = np.sqrt(1.0 / np.maximum(cx[:ndim], 1e-300))
        dxyz[ndim:] = REAL_MAX / 1000

        sizes = list(shape) + [1] * (3 - ndim)
        B = blocks
        for l in range(max_levels):
            min_d = dxyz[0] + dxyz[1] + dxyz[2] + 1
            cdir = -1
            for d in range(ndim):
                if sizes[d] > 1 and dxyz[d] < min_d:
                    min_d = dxyz[d]
                    cdir = d
            if l == max_levels - 1:
                cdir = -1
            node_inv = self._node_inverses(B, tuple(np.array(sizes[:ndim])))
            if cdir == -1:
                self.levels.append(_Level(B, nvars, -1, node_inv))
                break

            p_los, p_his, Ps = [], [], []
            for v in range(nvars):
                lo, hi = _collapse_interp(B[(v, v)], cdir)
                nf = B[(v, v)].shape[cdir]
                odd = np.arange(1, nf, 2)
                sl = [slice(None)] * ndim
                sl[cdir] = odd
                p_los.append(jnp.asarray(lo[tuple(sl)]))
                p_his.append(jnp.asarray(hi[tuple(sl)]))
                P, cshape = _build_P(tuple(B[(v, v)].shape), cdir, lo, hi)
                Ps.append(P)

            # monolithic Galerkin RAP, then split back into blocks
            Pblk = sp.block_diag(Ps).tocsr()
            n1 = int(np.prod(sizes[:ndim]))
            rowsM, colsM, valsM = [], [], []
            for (vi, vj), sm in B.items():
                Mc = sm.to_scipy().tocoo()
                rowsM.append(Mc.row + vi * n1)
                colsM.append(Mc.col + vj * n1)
                valsM.append(Mc.data)
            M = sp.coo_matrix(
                (np.concatenate(valsM), (np.concatenate(rowsM), np.concatenate(colsM))),
                shape=(nvars * n1, nvars * n1),
            ).tocsr()
            Mc2 = (Pblk.T @ M @ Pblk).tocsr()
            nc = int(np.prod(cshape))
            Bc = {}
            for vi in range(nvars):
                for vj in range(nvars):
                    sub = Mc2[vi * nc : (vi + 1) * nc, vj * nc : (vj + 1) * nc]
                    if sub.nnz:
                        Bc[(vi, vj)] = StructMatrix.from_scipy(sub.tocsr(), cshape)

            self.levels.append(_Level(B, nvars, cdir, node_inv, p_los, p_his))
            dxyz[cdir] *= 2
            sizes[cdir] = (sizes[cdir] + 1) // 2
            B = Bc

    @staticmethod
    def _node_inverses(B, shape):
        nvars = max(v for v, _ in B.keys()) + 1
        blk = np.zeros(tuple(shape) + (nvars, nvars))
        for (vi, vj), sm in B.items():
            z = (0,) * len(shape)
            if z in sm.offsets:
                blk[..., vi, vj] = np.asarray(sm.entry(z))
        return jnp.asarray(np.linalg.pinv(blk, rcond=1e-12))

    # ------------------------------------------------------------------
    def _relax(self, lvl: _Level, xs, bs, sweeps):
        w = self.opts.jacobi_weight
        for _ in range(sweeps):
            Ax = _sys_matvec(lvl.blocks, lvl.nvars, xs)
            r = [bs[v] - Ax[v] for v in range(lvl.nvars)]
            R = jnp.stack(r, axis=-1)  # [*grid, nvars]
            dz = jnp.einsum("...ij,...j->...i", lvl.node_inv, R)
            xs = tuple(xs[v] + w * dz[..., v] for v in range(lvl.nvars))
        return xs

    def _restrict(self, lvl: _Level, rs):
        from ..struct_ls.pfmg import PFMG as _P

        out = []
        for v in range(lvl.nvars):
            fake = _FakeLvl(lvl.cdir, lvl.p_lo[v], lvl.p_hi[v])
            out.append(_P._restrict(self, fake, rs[v]))
        return tuple(out)

    def _interp_add(self, lvl: _Level, xs, es):
        from ..struct_ls.pfmg import PFMG as _P

        out = []
        for v in range(lvl.nvars):
            fake = _FakeLvl(lvl.cdir, lvl.p_lo[v], lvl.p_hi[v])
            out.append(_P._interp_add(self, fake, xs[v], es[v]))
        return tuple(out)

    def _vcycle(self, l, bs):
        o = self.opts
        lvl = self.levels[l]
        zeros = tuple(jnp.zeros_like(b) for b in bs)
        if l == len(self.levels) - 1:
            return self._relax(lvl, zeros, bs, 2)
        xs = self._relax(lvl, zeros, bs, o.num_pre_relax)
        Ax = _sys_matvec(lvl.blocks, lvl.nvars, xs)
        rs = tuple(bs[v] - Ax[v] for v in range(lvl.nvars))
        es = self._vcycle(l + 1, self._restrict(lvl, rs))
        xs = self._interp_add(lvl, xs, es)
        return self._relax(lvl, xs, bs, o.num_post_relax)

    def cycle(self, bs, xs=None):
        return self._vcycle(0, bs) if xs is None else self._cycle_from(xs, bs)

    def _cycle_from(self, xs, bs):
        Ax = _sys_matvec(self.levels[0].blocks, self.nvars, xs)
        rs = tuple(bs[v] - Ax[v] for v in range(self.nvars))
        dz = self._vcycle(0, rs)
        return tuple(xs[v] + dz[v] for v in range(self.nvars))

    def solve(self, bs, xs=None) -> SolverResult:
        o = self.opts
        xs = tuple(jnp.zeros_like(b) for b in bs) if xs is None else xs
        bb = float(sum(jnp.vdot(b, b) for b in bs))
        rel = float("inf")
        converged = False
        norms = [float("nan")] * (o.max_iter + 1)
        it_done = 0
        step = jax.jit(self._cycle_from)
        for it in range(o.max_iter):
            Ax = _sys_matvec(self.levels[0].blocks, self.nvars, xs)
            rr = float(sum(jnp.vdot(bs[v] - Ax[v], bs[v] - Ax[v]) for v in range(self.nvars)))
            norms[it] = np.sqrt(rr)
            rel = np.sqrt(rr / max(bb, 1e-300))
            it_done = it
            if rel < o.tol and it > 0:
                converged = True
                break
            xs = step(xs, bs)
            it_done = it + 1
        return SolverResult(
            x=xs,
            num_iterations=jnp.asarray(it_done),
            rel_residual_norm=jnp.asarray(rel),
            converged=jnp.asarray(converged),
            res_norms=jnp.asarray(np.array(norms)),
        )


class _FakeLvl:
    def __init__(self, cdir, p_lo, p_hi):
        self.cdir = cdir
        self.p_lo = p_lo
        self.p_hi = p_hi
