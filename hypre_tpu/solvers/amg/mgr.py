"""MGR — multigrid reduction for multiphysics systems.

Reference: parcsr_ls/par_mgr{,_setup,_solve}.c (8.5 kLoC): the user tags
C (kept) and F (reduced) unknowns per level; each level smooths the F
block, forms a reduced coarse operator (Galerkin with an interpolation
built from the F/C blocks), and the final coarse system goes to
BoomerAMG.

Round-1 scope: single or multi reduction levels with
  * interp types: "jacobi" (P = [-D_ff^{-1} A_fc; I], MGR interp 2) and
    "injection" (P = [0; I], type 0)
  * F-relaxation: Jacobi sweeps on A_ff
  * coarse solve: BoomerAMG on the reduced operator
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
class MGROptions:
    interp_type: str = "jacobi"  # jacobi | injection  (mgr_interp_type 2|0)
    num_f_sweeps: int = 1
    amg: BoomerAMGOptions = BoomerAMGOptions(
        coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
        relax_down=18, relax_up=18,
    )


class MGR:
    def __init__(self, A: CSRMatrix, c_masks, opts: MGROptions = MGROptions()):
        """c_masks: boolean array (single level) or list of boolean
        arrays, one per reduction level (true = kept/C point)."""
        self.opts = opts
        if isinstance(c_masks, np.ndarray):
            c_masks = [c_masks]
        self.levels = []
        As = A.to_scipy().tocsr()
        for cm in c_masks:
            cm = np.asarray(cm, dtype=bool)
            cidx = np.flatnonzero(cm)
            fidx = np.flatnonzero(~cm)
            Aff = As[fidx][:, fidx].tocsr()
            Afc = As[fidx][:, cidx].tocsr()
            Acf = As[cidx][:, fidx].tocsr()
            Acc = As[cidx][:, cidx].tocsr()
            dff = Aff.diagonal()
            dffi = np.where(dff == 0, 0.0, 1.0 / np.where(dff == 0, 1, dff))
            if opts.interp_type == "jacobi":
                Wp = (-sp.diags(dffi) @ Afc).tocsr()
            else:
                Wp = sp.csr_matrix(Afc.shape)
            # reduced operator: Acc + Acf Wp (Galerkin with R = [Wr I])
            Ac = (Acc + Acf @ Wp).tocsr()
            self.levels.append(
                dict(
                    cidx=jnp.asarray(cidx),
                    fidx=jnp.asarray(fidx),
                    n=As.shape[0],
                    Aff=freeze_auto(CSRMatrix.from_scipy(Aff)),
                    Afc=freeze_auto(CSRMatrix.from_scipy(Afc)),
                    Acf=freeze_auto(CSRMatrix.from_scipy(Acf)),
                    Wp=freeze_auto(CSRMatrix.from_scipy(Wp)),
                    dffi=jnp.asarray(dffi),
                )
            )
            As = Ac
        self.amg = BoomerAMG(CSRMatrix.from_scipy(As), opts.amg)

    def _apply(self, l, r):
        """One MGR level: F-relax, restrict, recurse, interpolate."""
        lv = self.levels[l]
        rf = r[lv["fidx"]]
        rc = r[lv["cidx"]]
        # F-relaxation (Jacobi on A_ff, zero guess)
        xf = lv["dffi"] * rf
        for _ in range(self.opts.num_f_sweeps - 1):
            xf = xf + lv["dffi"] * (rf - spmv(lv["Aff"], xf))
        # restricted residual on C (R = [Acf-weighted injection])
        rc_red = rc - spmv(lv["Acf"], xf)
        if l + 1 < len(self.levels):
            xc = self._apply(l + 1, rc_red)
        else:
            xc = self.amg.cycle(rc_red)
        # interpolate: xf += Wp xc
        xf = xf + spmv(lv["Wp"], xc)
        x = jnp.zeros(lv["n"], r.dtype)
        x = x.at[lv["fidx"]].set(xf)
        x = x.at[lv["cidx"]].set(xc)
        return x

    def precond(self, r):
        return self._apply(0, r)

    def solve(self, A: CSRMatrix, b, tol=1e-8, max_iter=100) -> SolverResult:
        from ..krylov import FlexGMRESOptions, flexgmres

        E = freeze_auto(A)
        return flexgmres(
            lambda x: spmv(E, x), b, M=self.precond,
            opts=FlexGMRESOptions(tol=tol, max_iter=max_iter, k_dim=10),
        )
