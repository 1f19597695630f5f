"""FAC: fast adaptive composite multigrid for structured AMR.

Reference: sstruct_ls/fac*.c (17 files, ~12 kLoC): composite grids of
nested refinement patches; hypre assembles the composite operator
(fac_amr_rap.c + fac_cf{stencil,coarsen}.c: coarse rows near the
interface couple to fine patch cells, overlapped coarse data zeroed by
fac_zero_cdata.c), then cycles: relax on the patch level, correct on
the coarse composite level, interpolate back (fac_interp2.c).

Here: refinement factor 2, one cell-centered patch.  The composite
operator is assembled explicitly (host scipy) with first-order
flux-matched CF interface stencils; the FAC V-cycle is patch Jacobi
smoothing + a coarse-block correction solved by BoomerAMG.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix
from ..krylov.common import SolverResult


@dataclasses.dataclass
class FACOptions:
    tol: float = 1e-6
    max_iter: int = 60
    num_pre: int = 2
    num_post: int = 2
    relax_weight: float = 0.8


def build_composite_poisson(cshape, origin, psize, h_c=1.0):
    """Assemble the composite 7-pt Poisson operator for a coarse grid of
    `cshape` cells (spacing h_c) with a 2x-refined patch of `psize`
    COARSE cells at `origin`.  Returns (A composite CSR, index maps):
    unknowns = active coarse cells (outside patch) then fine patch cells.
    CF interface: first-order flux matching — a coarse cell abutting the
    patch couples to the mean of the 4 facing fine cells; a fine
    boundary cell couples to the facing coarse cell (fac_cfstencil.c
    role, lowest order)."""
    cshape = tuple(cshape)
    origin = tuple(origin)
    psize = tuple(psize)
    fshape = tuple(2 * p for p in psize)
    h_f = h_c / 2.0

    covered = np.zeros(cshape, bool)
    sl = tuple(slice(o, o + p) for o, p in zip(origin, psize))
    covered[sl] = True
    cidx = -np.ones(cshape, np.int64)
    act = np.flatnonzero(~covered.ravel())
    cidx.ravel()[act] = np.arange(len(act))
    nc = len(act)
    fidx = np.arange(int(np.prod(fshape))).reshape(fshape) + nc
    n = nc + fidx.size

    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r)
        cols.append(c)
        vals.append(v)

    # coarse rows
    it = np.ndindex(cshape)
    for I in it:
        if covered[I]:
            continue
        r = cidx[I]
        diag = 0.0
        for d in range(3):
            for s_ in (-1, 1):
                J = list(I)
                J[d] += s_
                if not (0 <= J[d] < cshape[d]):
                    diag += 1.0 / h_c**2  # Dirichlet boundary
                    continue
                J = tuple(J)
                if covered[J]:
                    # flux into the patch: couple to the mean of the 4
                    # facing fine cells (first-order interface)
                    F0 = [2 * (J[k] - origin[k]) for k in range(3)]
                    if s_ > 0:
                        F0[d] = 0 if J[d] == origin[d] else F0[d]
                    face = []
                    for a in range(2):
                        for bq in range(2):
                            F = list(F0)
                            od = [k for k in range(3) if k != d]
                            F[od[0]] += a
                            F[od[1]] += bq
                            F[d] = 0 if s_ > 0 else 2 * psize[d] - 1
                            F[d] = (2 * (J[d] - origin[d])) + (0 if s_ > 0 else 1)
                            face.append(tuple(F))
                    w = 1.0 / h_c**2 / len(face)
                    for F in face:
                        add(r, int(fidx[F]), -w)
                    diag += 1.0 / h_c**2
                else:
                    add(r, int(cidx[J]), -1.0 / h_c**2)
                    diag += 1.0 / h_c**2
        add(r, r, diag)

    # fine rows
    for F in np.ndindex(fshape):
        r = int(fidx[F])
        diag = 0.0
        for d in range(3):
            for s_ in (-1, 1):
                G = list(F)
                G[d] += s_
                if 0 <= G[d] < fshape[d]:
                    add(r, int(fidx[tuple(G)]), -1.0 / h_f**2)
                    diag += 1.0 / h_f**2
                else:
                    # CF interface (or domain boundary): facing coarse cell
                    J = [origin[k] + F[k] // 2 for k in range(3)]
                    J[d] += s_
                    if 0 <= J[d] < cshape[d] and not covered[tuple(J)]:
                        # distance between fine and coarse centers ~ 1.5 h_f
                        w = 1.0 / (1.5 * h_f * h_f)
                        add(r, int(cidx[tuple(J)]), -w)
                        diag += w
                    else:
                        diag += 1.0 / h_f**2  # Dirichlet
        add(r, r, diag)

    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    A.sort_indices()
    return A, cidx, fidx, nc


class FAC:
    """FAC cycle on an assembled composite operator: smooth the fine
    (patch) block, correct on the coarse block with BoomerAMG."""

    def __init__(self, A_comp: sp.csr_matrix, nc: int, opts: FACOptions = FACOptions()):
        from ..amg import BoomerAMG, BoomerAMGOptions

        self.opts = opts
        self.n = A_comp.shape[0]
        self.nc = nc
        self.A = CSRMatrix.from_scipy(A_comp.tocsr())
        self.Asp = A_comp.tocsr()
        d = A_comp.diagonal()
        self.dinv = jnp.asarray(np.where(d == 0, 0.0, 1.0 / np.where(d == 0, 1, d)))
        fmask = np.zeros(self.n)
        fmask[nc:] = 1.0
        self.fmask = jnp.asarray(fmask)
        amg_opts = BoomerAMGOptions(
            coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
            relax_down=18, relax_up=18, embed_level1=False,
        )
        Acc = A_comp[:nc, :nc].tocsr()
        self.amg_c = BoomerAMG(CSRMatrix.from_scipy(Acc), amg_opts)
        # the patch gets its own multigrid solve (hypre recurses SMG/PFMG
        # on each refinement level; here BoomerAMG on the patch block)
        Aff = A_comp[nc:, nc:].tocsr()
        self.amg_f = BoomerAMG(CSRMatrix.from_scipy(Aff), amg_opts)
        from ...ops.dia import freeze_auto, spmv as _spmv

        self._E = freeze_auto(self.A)
        self._spmv = _spmv

    def _residual(self, u, b):
        return b - self._spmv(self._E, u)

    def cycle(self, b, u):
        o = self.opts
        # patch-level correction (fine block solve)
        r = self._residual(u, b)
        e_f = self.amg_f.solve(r[self.nc:], tol=1e-6, max_iter=o.num_pre + 4).x
        u = u.at[self.nc:].add(e_f)
        # coarse composite correction
        r = self._residual(u, b)
        e_c = self.amg_c.solve(r[: self.nc], tol=1e-6, max_iter=20).x
        u = u.at[: self.nc].add(e_c)
        # post patch correction
        r = self._residual(u, b)
        e_f = self.amg_f.solve(r[self.nc:], tol=1e-6, max_iter=o.num_post + 4).x
        u = u.at[self.nc:].add(e_f)
        return u

    def solve(self, b) -> SolverResult:
        o = self.opts
        u = jnp.zeros_like(b)
        bn = float(jnp.linalg.norm(b)) or 1.0
        norms = []
        it = 0
        while it < o.max_iter:
            u = self.cycle(b, u)
            it += 1
            rn = float(jnp.linalg.norm(self._residual(u, b)))
            norms.append(rn)
            if rn / bn < o.tol:
                break
        return SolverResult(
            x=u,
            num_iterations=it,
            rel_residual_norm=norms[-1] / bn,
            converged=norms[-1] / bn < o.tol,
            res_norms=np.array(norms),
        )
