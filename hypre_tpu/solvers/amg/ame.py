"""AME — Maxwell eigensolver (LOBPCG + AMS).

Reference: parcsr_ls/ame.c (638 LoC): smallest eigenpairs of the
curl-curl operator A x = lambda M x on the divergence-free subspace;
LOBPCG preconditioned by AMS, with iterates kept M-orthogonal to the
gradient space (x <- x - G (G^T M G)^{-1} G^T M x each iteration).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix
from ...ops.dia import freeze_auto, spmv
from ..eigen import LOBPCGOptions, lobpcg
from .ams import AMS, AMSOptions
from .boomeramg import BoomerAMG, BoomerAMGOptions


@dataclasses.dataclass(frozen=True)
class AMEOptions:
    nev: int = 4
    tol: float = 1e-6
    max_iter: int = 200
    ams: AMSOptions = AMSOptions()


class AME:
    def __init__(
        self,
        A: CSRMatrix,
        M: CSRMatrix,
        G: CSRMatrix,
        coords: np.ndarray,
        opts: AMEOptions = AMEOptions(),
    ):
        self.opts = opts
        self.ams = AMS(A, G, coords, opts.ams)
        self._E = freeze_auto(A)
        self._Em = freeze_auto(M)
        Gs = G.to_scipy()
        Ms = M.to_scipy()
        # gradient-space projector pieces: K = G^T M G (nodal SPD)
        K = (Gs.T @ Ms @ Gs).tocsr()
        dg = K.diagonal()
        fix = np.flatnonzero(dg == 0)
        if fix.size:
            K = K + sp.coo_matrix((np.ones(fix.size), (fix, fix)), shape=K.shape)
        self._G = freeze_auto(G)
        self._GT = freeze_auto(CSRMatrix.from_scipy(Gs.T.tocsr()))
        self._amg_K = BoomerAMG(
            CSRMatrix.from_scipy(K.tocsr()),
            BoomerAMGOptions(coarsen_type="pmis", interp_type="ext+i",
                             P_max_elmts=4, relax_down=18, relax_up=18),
        )

    def _project(self, X):
        """Remove the gradient component: X -= G K^{-1} G^T M X
        (K^{-1} by a few AMG-PCG digits — ame.c uses an inner PCG)."""
        from ..krylov import PCGOptions, pcg

        cols = []
        for k in range(X.shape[1]):
            gmx = spmv(self._GT, spmv(self._Em, X[:, k]))
            y = pcg(
                lambda v: spmv(self._amg_K.levels[0].A, v),
                gmx,
                M=self._amg_K.precond,
                opts=PCGOptions(tol=1e-10, max_iter=50),
            ).x
            cols.append(X[:, k] - spmv(self._G, y))
        return jnp.stack(cols, axis=1)

    def solve(self, X0=None):
        o = self.opts
        n = self._E.num_rows
        # guard vectors resolve degenerate clusters (the lobpcg.c
        # blockSize-over-nev practice)
        m = o.nev + 2
        if X0 is None:
            X0 = jnp.asarray(
                np.random.default_rng(2747).standard_normal((n, m))
            )

        Aop = lambda X: jnp.stack(
            [spmv(self._E, X[:, k]) for k in range(X.shape[1])], axis=1
        )
        Bop = lambda X: jnp.stack(
            [spmv(self._Em, X[:, k]) for k in range(X.shape[1])], axis=1
        )

        def T(R):
            Z = jnp.stack(
                [self.ams.precond(R[:, k]) for k in range(R.shape[1])], axis=1
            )
            return self._project(Z)

        X0 = self._project(X0)
        res = lobpcg(
            Aop, X0, B=Bop, T=T,
            opts=LOBPCGOptions(tol=o.tol, max_iter=o.max_iter),
        )
        import dataclasses as _dc

        return _dc.replace(
            res,
            eigenvalues=res.eigenvalues[: o.nev],
            eigenvectors=res.eigenvectors[:, : o.nev],
            residual_norms=res.residual_norms[: o.nev],
        )
