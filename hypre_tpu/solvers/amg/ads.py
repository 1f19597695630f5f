"""ADS — auxiliary-space divergence solver for face (RT0) elements.

Reference: parcsr_ls/ads.c (1402 LoC), stacked on AMS: for
A = div-div + mass on faces, combine
  * a smoother on A (l1-Jacobi here)
  * a curl-space correction  C B_C C^T with B_C = AMS on A_C = C^T A C
  * a vector-nodal correction Pi B_Pi Pi^T, Pi = RT0 interpolation,
    B_Pi = AMG on A_Pi = Pi^T A Pi
multiplicative cycle 01210 like AMS.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix
from ...ops.dia import freeze_auto, spmv
from ..krylov.common import SolverResult
from .ams import AMS, AMSOptions
from .boomeramg import BoomerAMG, BoomerAMGOptions


@dataclasses.dataclass(frozen=True)
class ADSOptions:
    ams: AMSOptions = AMSOptions()
    amg: BoomerAMGOptions = BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18,
    )
    smooth_sweeps: int = 1


class ADS:
    def __init__(self, A: CSRMatrix, C: CSRMatrix, Pi: CSRMatrix,
                 G: CSRMatrix, coords: np.ndarray,
                 opts: ADSOptions = ADSOptions()):
        self.opts = opts
        As = A.to_scipy()
        Cs = C.to_scipy()
        Pis = Pi.to_scipy()
        self._E = freeze_auto(A)
        l1 = np.asarray(np.abs(As).sum(axis=1)).ravel()
        self._l1inv = jnp.asarray(np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1, l1)))

        # curl space: A_C = C^T A C, preconditioned by AMS
        AC = (Cs.T @ As @ Cs).tocsr()
        dg = AC.diagonal()
        fix = np.flatnonzero(dg == 0)
        if fix.size:
            AC = AC + sp.coo_matrix((np.ones(fix.size), (fix, fix)), shape=AC.shape)
        self._C = freeze_auto(C)
        self._CT = freeze_auto(CSRMatrix.from_scipy(Cs.T.tocsr()))
        self._ams = AMS(CSRMatrix.from_scipy(AC.tocsr()), G, coords, opts.ams)

        # RT nodal space
        APi = (Pis.T @ As @ Pis).tocsr()
        dg = APi.diagonal()
        fix = np.flatnonzero(dg == 0)
        if fix.size:
            APi = APi + sp.coo_matrix((np.ones(fix.size), (fix, fix)), shape=APi.shape)
        self._Pi = freeze_auto(Pi)
        self._PiT = freeze_auto(CSRMatrix.from_scipy(Pis.T.tocsr()))
        self._amg_Pi = BoomerAMG(CSRMatrix.from_scipy(APi.tocsr()), opts.amg)

    def _smooth(self, u, r_of):
        for _ in range(self.opts.smooth_sweeps):
            u = u + self._l1inv * r_of(u)
        return u

    def precond(self, b):
        r_of = lambda u: b - spmv(self._E, u)
        u = jnp.zeros_like(b)
        u = self._smooth(u, r_of)
        u = u + spmv(self._C, self._ams.precond(spmv(self._CT, r_of(u))))
        u = u + spmv(self._Pi, self._amg_Pi.cycle(spmv(self._PiT, r_of(u))))
        u = u + spmv(self._C, self._ams.precond(spmv(self._CT, r_of(u))))
        u = self._smooth(u, r_of)
        return u

    def solve(self, b, tol=1e-6, max_iter=200) -> SolverResult:
        from ..krylov import PCGOptions, pcg

        return pcg(lambda x: spmv(self._E, x), b, M=self.precond,
                   opts=PCGOptions(tol=tol, max_iter=max_iter))
