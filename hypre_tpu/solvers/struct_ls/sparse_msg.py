"""SparseMSG: multigrid with multiple semicoarsened grids.

Reference: struct_ls/sparse_msg{,_setup,_solve}.c (Mulder's MSG scheme,
sparse variant).  Grids are indexed (lx, ly, lz) by how many times each
direction has been semicoarsened (sparse_msg.h:94 MapIndex); the cycle
sweeps grid LEVELS l = lx+ly+lz downward, restricting each grid's
residual to ALL of its children (one per direction) with
multiply-visited children averaged by restrict_count
(sparse_msg_solve.c:196-293), then interpolates corrections back up the
same DAG (again averaged over incoming edges).  Robust for anisotropy
without committing to PFMG's single coarsening direction per level.

Each grid's operator is a StructMatrix (device fused-shift matvec);
per-direction P is the PFMG stencil-collapse interpolation; Galerkin
coarse operators and transfers are host scipy (setup runs once).
"""

from __future__ import annotations

import dataclasses
import itertools

import jax.numpy as jnp
import numpy as np

from ...struct import StructMatrix
from ...struct.matrix import struct_matvec
from ..krylov.common import SolverResult
from .pfmg import _build_P, _collapse_interp


@dataclasses.dataclass
class SparseMSGOptions:
    tol: float = 1e-6
    max_iter: int = 100
    relax_weight: float = 0.8
    num_pre: int = 1
    num_post: int = 1


class SparseMSG:
    def __init__(self, A: StructMatrix, opts: SparseMSGOptions = SparseMSGOptions()):
        self.opts = opts
        self._setup(A.densify())

    def _edge(self, g, d, step=1):
        return tuple(v + (step if i == d else 0) for i, v in enumerate(g))

    def _setup(self, A0: StructMatrix) -> None:
        shape0 = tuple(A0.shape)
        nd = len(shape0)
        nl = []
        for d in range(nd):
            s, k = shape0[d], 1
            while s > 2:
                k += 1
                s = (s + 1) // 2
            nl.append(k)
        self.nl = tuple(nl)
        self.root = (0,) * nd

        self.grids = {self.root: A0}
        self.Pmat = {}  # (grid, dir) -> (scipy P, coarse shape)
        for level in range(1, sum(self.nl) - nd + 1):
            for g in itertools.product(*[range(k) for k in self.nl]):
                if sum(g) != level or g in self.grids:
                    continue
                d = next(i for i in range(nd) if g[i] > 0)
                parent = self._edge(g, d, -1)
                if parent not in self.grids:
                    continue
                Ap = self.grids[parent]
                if Ap.shape[d] < 3:
                    continue
                p_lo, p_hi = _collapse_interp(Ap, d)
                P, cshape = _build_P(tuple(Ap.shape), d, p_lo, p_hi)
                Ac = (P.T @ Ap.to_scipy() @ P).tocsr()
                self.grids[g] = StructMatrix.from_scipy(Ac, cshape)
                self.Pmat[(parent, d)] = (P, cshape)
        # fill remaining DAG edges (multiple parents per grid)
        for g, Ag in list(self.grids.items()):
            for d in range(nd):
                child = self._edge(g, d)
                if child in self.grids and (g, d) not in self.Pmat and Ag.shape[d] >= 3:
                    p_lo, p_hi = _collapse_interp(Ag, d)
                    P, cshape = _build_P(tuple(Ag.shape), d, p_lo, p_hi)
                    if cshape == tuple(self.grids[child].shape):
                        self.Pmat[(g, d)] = (P, cshape)
        self.keys = sorted(self.grids, key=lambda g: (sum(g), g))
        # device transfer operators (frozen ELL) so the whole cycle is
        # device-side and jittable — one dispatch per cycle instead of
        # per-grid host round-trips
        from ...ops.csr import CSRMatrix as _CSR
        from ...ops.dia import freeze_auto as _freeze

        self.Pdev = {}
        self.Rdev = {}
        self.cshapes = {}
        for (g, d), (P, cshape) in self.Pmat.items():
            self.Pdev[(g, d)] = _freeze(_CSR.from_scipy(P.tocsr()))
            self.Rdev[(g, d)] = _freeze(_CSR.from_scipy(P.T.tocsr()))
            self.cshapes[(g, d)] = cshape
        # visit weights (sparse_msg_filter.c FilterSetup): per point,
        # lambda_d = (sum of +a over offsets with zero d-component,
        # -a otherwise)^2; visit_d = lambda_d / sum(lambda) partitions
        # the interpolated corrections among directions
        self.visit = {}
        for g in self.keys:
            Ag = self.grids[g]
            data = np.asarray(Ag.data)
            lam = []
            for d in range(nd):
                acc = np.zeros(Ag.shape)
                for k, off in enumerate(Ag.offsets):
                    acc += data[k] if off[d] == 0 else -data[k]
                lam.append(acc**2)
            tot = sum(lam)
            tot = np.where(tot == 0, 1.0, tot)
            self.visit[g] = tuple(jnp.asarray(l / tot) for l in lam)
        self.dinv = {
            g: jnp.asarray(
                np.where(
                    np.asarray(self.grids[g].diagonal()) == 0,
                    0.0,
                    1.0 / np.where(np.asarray(self.grids[g].diagonal()) == 0, 1,
                                   np.asarray(self.grids[g].diagonal())),
                )
            )
            for g in self.keys
        }

    def _relax(self, g, u, f, sweeps):
        A = self.grids[g]
        w = self.opts.relax_weight
        for _ in range(sweeps):
            u = u + w * self.dinv[g].reshape(u.shape) * (f - struct_matvec(A, u))
        return u

    def cycle(self, f0, u0=None):
        o = self.opts
        if u0 is None:
            u0 = jnp.zeros_like(f0)
        F = {self.root: f0}
        U = {self.root: u0}
        count = {self.root: 1}
        max_level = max(sum(g) for g in self.keys)
        for level in range(max_level + 1):
            for g in [k for k in self.keys if sum(k) == level and k in F]:
                if count[g] > 1:
                    F[g] = F[g] / count[g]
                U[g] = self._relax(g, U[g], F[g], o.num_pre)
                r = F[g] - struct_matvec(self.grids[g], U[g])
                for d in range(len(g)):
                    key = (g, d)
                    child = self._edge(g, d)
                    if key not in self.Pmat or child not in self.grids:
                        continue
                    from ...ops.dia import spmv as _spmv

                    cshape = self.cshapes[key]
                    rc = _spmv(self.Rdev[key], r.ravel())[: int(np.prod(cshape))].reshape(cshape)
                    if child in F:
                        F[child] = F[child] + rc
                        count[child] += 1
                    else:
                        F[child] = rc
                        U[child] = jnp.zeros_like(rc)
                        count[child] = 1
        for level in range(max_level, 0, -1):
            for g in [k for k in self.keys if sum(k) == level and k in U]:
                U[g] = self._relax(g, U[g], F[g], o.num_post)
                for d in range(len(g)):
                    p = self._edge(g, d, -1)
                    if p not in U or (p, d) not in self.Pmat:
                        continue
                    from ...ops.dia import spmv as _spmv

                    pshape = tuple(self.grids[p].shape)
                    up = _spmv(self.Pdev[(p, d)], U[g].ravel())[: int(np.prod(pshape))].reshape(pshape)
                    U[p] = U[p] + self.visit[p][d] * up
        return self._relax(self.root, U[self.root], F[self.root], o.num_post)

    def solve(self, b, x0=None) -> SolverResult:
        import jax

        o = self.opts
        A = self.grids[self.root]
        x = jnp.zeros_like(b) if x0 is None else x0
        bnorm = float(jnp.linalg.norm(b.ravel())) or 1.0
        norms = [float(jnp.linalg.norm((b - struct_matvec(A, x)).ravel()))]
        cyc = jax.jit(self.cycle)
        it = 0
        while it < o.max_iter:
            x = cyc(b, x)
            it += 1
            rn = float(jnp.linalg.norm((b - struct_matvec(A, x)).ravel()))
            norms.append(rn)
            if rn / bnorm < o.tol:
                break
        return SolverResult(
            x=x,
            num_iterations=it,
            rel_residual_norm=norms[-1] / bnorm,
            converged=norms[-1] / bnorm < o.tol,
            res_norms=np.array(norms),
        )
