"""Smoothed-aggregation AMG (the FEI_mv/femli MLI role).

Reference: FEI_mv/femli (~40 kLoC C++ smoothed aggregation).  Classic
SA: greedy strength-based aggregation, tentative piecewise-constant
P_tent (near-null-space vector per aggregate), damped-Jacobi prolongator
smoothing P = (I - omega D^{-1} A) P_tent, Galerkin RAP.

TPU design: same host-setup / device-solve split as BoomerAMG — the
frozen hierarchy reuses AMGLevel machinery via composition (Jacobi
smoothers, V-cycle, PCG preconditioning).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix
from ...ops.dia import freeze_auto, spmv
from ..krylov.common import SolverResult
from .strength import strength_matrix


@dataclasses.dataclass(frozen=True)
class SAOptions:
    theta: float = 0.08  # SA strength drop (scaled |a_ij|^2 test classic)
    omega: float = 2.0 / 3.0  # prolongator smoothing damping
    max_levels: int = 20
    max_coarse_size: int = 32
    num_sweeps: int = 1
    jacobi_weight: float = 2.0 / 3.0


def _aggregate(S: sp.csr_matrix) -> np.ndarray:
    """Greedy root-based aggregation (femli MLI_AggrAMG style):
    pass 1 roots with unaggregated neighborhoods; pass 2 attach leftovers."""
    n = S.shape[0]
    agg = np.full(n, -1, dtype=np.int64)
    na = 0
    indptr, indices = S.indptr, S.indices
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if (agg[nbrs] == -1).all():
            agg[i] = na
            agg[nbrs] = na
            na += 1
    # pass 2: attach to an adjacent aggregate
    for i in range(n):
        if agg[i] == -1:
            nbrs = indices[indptr[i] : indptr[i + 1]]
            done = nbrs[agg[nbrs] != -1]
            if done.size:
                agg[i] = agg[done[0]]
            else:
                agg[i] = na
                na += 1
    return agg


class SmoothedAggregationAMG:
    def __init__(self, A: CSRMatrix, opts: SAOptions = SAOptions(),
                 near_null: np.ndarray | None = None):
        self.opts = opts
        self.levels = []  # list of dicts {A, dinv, P, R}
        As = A.to_scipy().tocsr()
        o = opts
        nn = near_null if near_null is not None else np.ones(As.shape[0])
        for l in range(o.max_levels):
            n = As.shape[0]
            diag = As.diagonal()
            dinv = np.where(diag == 0, 0.0, 1.0 / np.where(diag == 0, 1, diag))
            if n <= o.max_coarse_size:
                self.levels.append(dict(
                    A=freeze_auto(CSRMatrix.from_scipy(As)),
                    dinv=jnp.asarray(dinv),
                    coarse_inv=jnp.asarray(np.linalg.pinv(As.toarray(), rcond=1e-12)),
                    P=None, R=None,
                ))
                break
            S = strength_matrix(CSRMatrix.from_scipy(As), o.theta, 1.0)
            agg = _aggregate(S)
            na = int(agg.max()) + 1
            # tentative prolongator with near-null-space normalization
            Pt = sp.coo_matrix((nn, (np.arange(n), agg)), shape=(n, na)).tocsr()
            norms = np.sqrt(np.asarray(Pt.multiply(Pt).sum(axis=0))).ravel()
            norms[norms == 0] = 1.0
            Pt = (Pt @ sp.diags(1.0 / norms)).tocsr()
            nn = norms  # coarse near-null vector
            # smooth: P = (I - omega D^{-1} A) P_tent
            P = (Pt - o.omega * (sp.diags(dinv) @ As @ Pt)).tocsr()
            Ac = (P.T @ As @ P).tocsr()
            self.levels.append(dict(
                A=freeze_auto(CSRMatrix.from_scipy(As)),
                dinv=jnp.asarray(dinv),
                P=freeze_auto(CSRMatrix.from_scipy(P)),
                R=freeze_auto(CSRMatrix.from_scipy(P.T.tocsr())),
                coarse_inv=None,
            ))
            As = Ac

    def cycle(self, f, u=None):
        return self._vc(0, jnp.zeros_like(f) if u is None else u, f)

    def _vc(self, l, u, f):
        o = self.opts
        lv = self.levels[l]
        if lv["P"] is None:
            return lv["coarse_inv"] @ f
        w = o.jacobi_weight
        for _ in range(o.num_sweeps):
            u = u + w * lv["dinv"] * (f - spmv(lv["A"], u))
        r = f - spmv(lv["A"], u)
        ec = self._vc(l + 1, jnp.zeros(lv["R"].num_rows, f.dtype), spmv(lv["R"], r))
        u = u + spmv(lv["P"], ec)
        for _ in range(o.num_sweeps):
            u = u + w * lv["dinv"] * (f - spmv(lv["A"], u))
        return u

    @property
    def precond(self):
        return lambda r: self.cycle(r)

    @property
    def num_levels(self):
        return len(self.levels)
