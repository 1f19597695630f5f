"""AMS — auxiliary-space Maxwell solver for edge elements.

Reference: parcsr_ls/ams.c (hypre_AMSSetup/Solve, ~3980 LoC).  The
preconditioner for A = curl-curl + mass on Nedelec edges combines:
  * a smoother on A (reference default l1-GS; here l1-Jacobi)
  * a nodal correction through the discrete gradient:  G B_G G^T,
    B_G = AMG on A_G = G^T A G           (ams.c "G-space")
  * a vector-nodal correction through the Nedelec interpolation
    Pi = [Pi_x Pi_y Pi_z], Pi_d[e, n] = 0.5 |G[e,n]| t_d(e) with t the
    edge tangent from vertex coordinates (hypre_AMSComputePi):
    Pi B_Pi Pi^T, B_Pi = AMG on A_Pi = Pi^T A Pi
  * multiplicative cycle "01210" (ams.c cycle_type 1 default):
    smooth, G-correct, Pi-correct, G-correct, smooth.
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
from .boomeramg import BoomerAMG, BoomerAMGOptions


@dataclasses.dataclass(frozen=True)
class AMSOptions:
    cycle_type: int = 1  # 1 = multiplicative 01210
    amg: BoomerAMGOptions = BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18,
    )
    smooth_sweeps: int = 1


def compute_pi(G: CSRMatrix, coords: np.ndarray) -> sp.csr_matrix:
    """Nedelec interpolation Pi: edges x 3*nodes (hypre_AMSComputePi)."""
    Gs = G.to_scipy().tocoo()
    ne, nn = Gs.shape
    # edge tangents from the gradient pattern: t = x_head - x_tail
    tang = np.zeros((ne, 3))
    for d in range(3):
        tang[:, d] = np.asarray(G.to_scipy() @ coords[:, d])
    rows, cols, vals = [], [], []
    for d in range(3):
        rows.append(Gs.row)
        cols.append(Gs.col * 3 + d)  # interleaved nodal ordering (hypre)
        vals.append(0.5 * np.abs(Gs.data) * tang[Gs.row, d])
    Pi = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(ne, 3 * nn),
    ).tocsr()
    Pi.sort_indices()
    return Pi


class AMS:
    def __init__(
        self,
        A: CSRMatrix,
        G: CSRMatrix,
        coords: np.ndarray,
        opts: AMSOptions = AMSOptions(),
    ):
        self.opts = opts
        As = A.to_scipy()
        Gs = G.to_scipy()
        self._E = freeze_auto(A)

        l1 = np.asarray(np.abs(As).sum(axis=1)).ravel()
        self._l1inv = jnp.asarray(
            np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1, l1))
        )

        # G-space: A_G = G^T A G; for a pure curl-curl operator this is
        # exactly zero (beta_is_zero mode, ams.c) -> skip the G-correction
        AG = (Gs.T @ As @ Gs).tocsr()
        AG.sort_indices()
        scale = abs(As).max() or 1.0
        self._beta_is_zero = AG.nnz == 0 or abs(AG).max() < 1e-12 * scale
        self._G = freeze_auto(G)
        self._GT = freeze_auto(CSRMatrix.from_scipy(Gs.T.tocsr()))
        if not self._beta_is_zero:
            dg = AG.diagonal()
            fix = np.flatnonzero(dg == 0)
            if fix.size:
                AG = AG + sp.coo_matrix(
                    (np.ones(fix.size), (fix, fix)), shape=AG.shape
                ).tocsr()
            self._amg_G = BoomerAMG(CSRMatrix.from_scipy(AG), opts.amg)
        else:
            self._amg_G = None

        # Pi-space: A_Pi = Pi^T A Pi
        Pi = compute_pi(G, coords)
        APi = (Pi.T @ As @ Pi).tocsr()
        APi.sort_indices()
        dp = APi.diagonal()
        fix = np.flatnonzero(dp == 0)
        if fix.size:
            APi = APi + sp.coo_matrix(
                (np.ones(fix.size), (fix, fix)), shape=APi.shape
            ).tocsr()
        self._Pi = freeze_auto(CSRMatrix.from_scipy(Pi))
        self._PiT = freeze_auto(CSRMatrix.from_scipy(Pi.T.tocsr()))
        self._amg_Pi = BoomerAMG(CSRMatrix.from_scipy(APi), opts.amg)

    # ------------------------------------------------------------------
    def _smooth(self, u, r_of_u):
        for _ in range(self.opts.smooth_sweeps):
            u = u + self._l1inv * r_of_u(u)
        return u

    def precond(self, b):
        """One multiplicative 01210 cycle, zero initial guess."""
        E = self._E
        r_of = lambda u: b - spmv(E, u)

        u = jnp.zeros_like(b)
        u = self._smooth(u, r_of)  # 0
        if self._amg_G is not None:
            u = u + spmv(self._G, self._amg_G.cycle(spmv(self._GT, r_of(u))))  # 1
        u = u + spmv(self._Pi, self._amg_Pi.cycle(spmv(self._PiT, r_of(u))))  # 2
        if self._amg_G is not None:
            u = u + spmv(self._G, self._amg_G.cycle(spmv(self._GT, r_of(u))))  # 1
        u = self._smooth(u, r_of)  # 0
        return u

    def solve(self, b, tol=1e-6, max_iter=200) -> SolverResult:
        """AMS-PCG (the ams_driver.c usage pattern)."""
        from ..krylov import PCGOptions, pcg

        return pcg(
            lambda x: spmv(self._E, x),
            b,
            M=self.precond,
            opts=PCGOptions(tol=tol, max_iter=max_iter),
        )
