"""BoomerAMG: hierarchy setup + multigrid cycles.

Reference: parcsr_ls/par_amg_setup.c (hypre_BoomerAMGSetup:27),
par_cycle.c (hypre_BoomerAMGCycle:22, nonrecursive V/W/F state machine),
par_amg_solve.c (hypre_BoomerAMGSolve:22), par_stats.c (complexities).

TPU design (SURVEY §7 stance): setup is host-side numpy/scipy — it is
shape-dynamic and runs once — producing a static list of device-frozen
levels (ELL matrices + smoother data).  The cycle is a Python-unrolled
recursion over that static list inside one jit; the solve loop is a
lax.while_loop.  relax_order CF sweeps follow par_cycle.c:398-414
(down: C then F; up: F then C).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix, ELLMatrix
from ...ops.spmv import ell_spmv
from ...utils.timing import timed
from ..krylov.common import SolverResult
from .coarsen import C_PT, hmis_coarsen, pmis_coarsen, ruge_stuben_coarsen
from .interp import (
    classical_interp,
    direct_interp,
    extended_i_interp,
    truncate_interp,
)
from .rap import galerkin_rap
from .relax import (
    ChebyData,
    GSSchedule,
    build_gs_schedule,
    cheby_setup,
    chebyshev,
    gauss_seidel,
    jacobi,
    jacobi_cf,
    l1_jacobi,
)
from .strength import strength_matrix

_GS_TYPES = (3, 4, 6, 13, 14)


@dataclasses.dataclass(frozen=True)
class BoomerAMGOptions:
    # setup (par_amg.c defaults)
    max_levels: int = 25
    max_coarse_size: int = 9
    strong_threshold: float = 0.25
    max_row_sum: float = 0.9
    coarsen_type: str = "pmis"  # pmis | hmis | rs  (hypre 8 | 10 | 0)
    interp_type: str = "classical"  # classical | direct | ext+i (hypre 0|3|6)
    trunc_factor: float = 0.0
    P_max_elmts: int = 0
    # smoothing
    relax_down: int = 13
    relax_up: int = 14
    relax_coarse: int = 9  # 9 = Gaussian elimination
    relax_order: int = 0
    relax_weight: float = 1.0
    num_sweeps: int = 1
    cheby_order: int = 2
    cheby_ratio: float = 0.3
    # cycling
    cycle_type: int = 1  # 1 = V (W/F planned)
    seed: int = 2747
    # device precision for the frozen solve-phase hierarchy; setup math
    # stays float64 on host (the --enable-single analog, SURVEY §5)
    dtype: str = "float64"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AMGLevel:
    A: ELLMatrix
    dinv: jax.Array
    l1inv: jax.Array
    cmask: jax.Array  # bool: CF_marker > 0 (all False on coarsest)
    P: Optional[ELLMatrix]  # None on coarsest
    R: Optional[ELLMatrix]  # P^T
    gs_fwd: Optional[GSSchedule]
    gs_bwd: Optional[GSSchedule]
    cheby: Optional[ChebyData]
    coarse_inv: Optional[jax.Array]  # dense pinv on coarsest


class BoomerAMG:
    """Setup once; then `.cycle` (jittable), `.solve`, or use as a
    preconditioner callable via `.precond`."""

    def __init__(self, A: CSRMatrix, opts: BoomerAMGOptions = BoomerAMGOptions()):
        self.opts = opts
        self.levels: list[AMGLevel] = []
        self._host_A: list[sp.csr_matrix] = []
        self._cf: list[np.ndarray] = []
        self._setup(A)

    # ------------------------------------------------------------------
    # setup (host)
    # ------------------------------------------------------------------
    def _setup(self, A0: CSRMatrix) -> None:
        o = self.opts
        A = A0.to_scipy().tocsr()
        A.sort_indices()
        with timed("SETUP"):
            while True:
                n = A.shape[0]
                last = len(self._host_A) >= o.max_levels - 1 or n <= o.max_coarse_size
                if not last:
                    with timed("STRENGTH"):
                        S = strength_matrix(
                            CSRMatrix.from_scipy(A), o.strong_threshold, o.max_row_sum
                        )
                    with timed("COARSEN"):
                        cf = self._coarsen(S)
                    nc = int((cf > 0).sum())
                    if nc == 0 or nc == n:
                        last = True
                if last:
                    self._host_A.append(A)
                    self._cf.append(np.zeros(A.shape[0], dtype=np.int64))
                    self.levels.append(self._freeze_level(A, None, None, None))
                    break
                with timed("INTERP"):
                    P = self._interp(A, S, cf)
                    P = truncate_interp(P, o.trunc_factor, o.P_max_elmts)
                with timed("RAP"):
                    Ac = galerkin_rap(A, P)
                self._host_A.append(A)
                self._cf.append(cf)
                self.levels.append(self._freeze_level(A, P, P.T.tocsr(), cf))
                A = Ac

    def _coarsen(self, S):
        o = self.opts
        if o.coarsen_type == "pmis":
            return pmis_coarsen(S, seed=o.seed)
        if o.coarsen_type == "hmis":
            return hmis_coarsen(S, seed=o.seed)
        if o.coarsen_type == "rs":
            return ruge_stuben_coarsen(S)
        raise ValueError(f"unknown coarsen_type {o.coarsen_type}")

    def _interp(self, A, S, cf):
        o = self.opts
        fn = {
            "classical": classical_interp,
            "direct": direct_interp,
            "ext+i": extended_i_interp,
        }[o.interp_type]
        return fn(A, S, cf)

    def _freeze_level(self, A, P, R, cf) -> AMGLevel:
        o = self.opts
        dt = np.dtype(o.dtype)
        Ah = CSRMatrix.from_scipy(A)
        n = A.shape[0]
        diag = A.diagonal()
        safe = np.where(diag == 0, 1.0, diag)
        dinv = np.where(diag == 0, 0.0, 1.0 / safe)
        l1 = np.zeros(n)
        rows = np.repeat(np.arange(n), np.diff(A.indptr))
        np.add.at(l1, rows, np.abs(A.data))
        l1inv = np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1.0, l1))

        coarsest = P is None
        relax_types = {o.relax_down, o.relax_up} if not coarsest else {o.relax_coarse}
        need_gs = bool(relax_types & set(_GS_TYPES))
        # option-4 l1 divisor degenerates to |diag| on one partition;
        # sign follows the diagonal (ams.c:642-660)
        gs_div = np.where(diag == 0, 1.0, diag)

        gs_fwd = gs_bwd = None
        if need_gs and not coarsest:
            gs_fwd = build_gs_schedule(Ah, forward=True, divisor=gs_div)
            gs_bwd = build_gs_schedule(Ah, forward=False, divisor=gs_div)

        cheby = None
        if 16 in relax_types and not coarsest:
            cheby = cheby_setup(Ah, o.cheby_order, o.cheby_ratio)

        coarse_inv = None
        if coarsest:
            coarse_inv = jnp.asarray(
                np.linalg.pinv(A.toarray(), rcond=1e-12).astype(dt)
            )

        return AMGLevel(
            A=Ah.to_ell(dtype=dt),
            dinv=jnp.asarray(dinv.astype(dt)),
            l1inv=jnp.asarray(l1inv.astype(dt)),
            cmask=jnp.asarray((cf > 0) if cf is not None else np.zeros(n, bool)),
            P=None if P is None else CSRMatrix.from_scipy(P).to_ell(dtype=dt),
            R=None if R is None else CSRMatrix.from_scipy(R).to_ell(dtype=dt),
            gs_fwd=gs_fwd,
            gs_bwd=gs_bwd,
            cheby=cheby,
            coarse_inv=coarse_inv,
        )

    # ------------------------------------------------------------------
    # stats (par_stats.c)
    # ------------------------------------------------------------------
    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def grid_complexity(self) -> float:
        n0 = self._host_A[0].shape[0]
        return sum(a.shape[0] for a in self._host_A) / n0

    def operator_complexity(self) -> float:
        nnz0 = self._host_A[0].nnz
        return sum(a.nnz for a in self._host_A) / nnz0

    def cycle_complexity(self) -> float:
        """nnz-weighted work per V-cycle relative to fine nnz
        (par_stats.c: sweeps down + up per level, coarse solve counted once)."""
        o = self.opts
        nnz0 = self._host_A[0].nnz
        work = 0.0
        for l, a in enumerate(self._host_A):
            if l == len(self._host_A) - 1:
                work += a.nnz
            else:
                sweeps = 2 * o.num_sweeps * (2 if o.relax_order == 1 else 1)
                work += sweeps * a.nnz
        return work / nnz0

    # ------------------------------------------------------------------
    # cycle (device)
    #
    # All methods below take the frozen hierarchy `levels` as an explicit
    # argument so callers can jit with the hierarchy as a traced pytree
    # input.  Closing over device arrays instead would embed them as jaxpr
    # constants — correct, but some runtimes (remote-device tunnels)
    # re-upload constants per call, which murders performance.
    # ------------------------------------------------------------------
    def _smooth(self, lvl: AMGLevel, relax_type: int, u, f, up: bool):
        o = self.opts
        w = o.relax_weight
        if relax_type == 9:
            return lvl.coarse_inv @ f
        if relax_type in (0, 7, 18):
            div = lvl.l1inv if relax_type == 18 else lvl.dinv
            if o.relax_order == 1:
                order = (~lvl.cmask, lvl.cmask) if up else (lvl.cmask, ~lvl.cmask)
                for mask in order:
                    u = jacobi_cf(lvl.A, div, u, f, mask, w)
                return u
            return jacobi(lvl.A, div, u, f, w)
        if relax_type in (3, 13):
            return gauss_seidel(lvl.gs_fwd, u, f, w)
        if relax_type in (4, 14):
            return gauss_seidel(lvl.gs_bwd, u, f, w)
        if relax_type == 6:
            u = gauss_seidel(lvl.gs_fwd, u, f, w)
            return gauss_seidel(lvl.gs_bwd, u, f, w)
        if relax_type == 16:
            return chebyshev(lvl.A, lvl.cheby, u, f)
        raise ValueError(f"relax_type {relax_type} not implemented")

    def cycle(self, f, u=None, levels=None):
        """One V-cycle.  Pass `levels` explicitly inside jits (see note
        above); defaults to this instance's hierarchy."""
        levels = self.levels if levels is None else levels
        if u is None:
            u = jnp.zeros_like(f)
        return self._vcycle(levels, 0, u, f)

    def _vcycle(self, levels, l: int, u, f):
        o = self.opts
        lvl = levels[l]
        if l == len(levels) - 1:
            return self._smooth(lvl, o.relax_coarse, u, f, up=False)
        for _ in range(o.num_sweeps):
            u = self._smooth(lvl, o.relax_down, u, f, up=False)
        r = f - ell_spmv(lvl.A, u)[: lvl.A.num_rows]
        fc = ell_spmv(lvl.R, r)[: lvl.R.num_rows]
        uc = self._vcycle(levels, l + 1, jnp.zeros_like(fc), fc)
        u = u + ell_spmv(lvl.P, uc)[: lvl.P.num_rows]
        for _ in range(o.num_sweeps):
            u = self._smooth(lvl, o.relax_up, u, f, up=True)
        return u

    @property
    def precond(self):
        """M(r) -> z: one cycle with zero initial guess (the PCG hook).
        Note: closes over the hierarchy; inside performance-critical jits
        prefer `precond_fn` + explicit levels argument."""
        return lambda r: self.cycle(r)

    @property
    def precond_fn(self):
        """(levels, r) -> z, hierarchy passed explicitly (jit-arg style)."""
        return lambda levels, r: self.cycle(r, levels=levels)

    @property
    def levels_tuple(self):
        return tuple(self.levels)

    # ------------------------------------------------------------------
    # standalone solve (par_amg_solve.c)
    # ------------------------------------------------------------------
    def solve(
        self,
        b,
        x0=None,
        tol: float = 1e-7,
        max_iter: int = 20,
        min_iter: int = 0,
        levels=None,
    ) -> SolverResult:
        """Iterate V-cycles until ||r||/||b|| < tol (par_amg_solve.c:243)."""
        levels = self.levels if levels is None else levels
        lvl0 = levels[0]
        n = lvl0.A.num_rows
        x0 = jnp.zeros(n, dtype=lvl0.A.data.dtype) if x0 is None else x0

        A = lvl0.A
        b_norm = jnp.sqrt(jnp.vdot(b, b))
        r0 = b - ell_spmv(A, x0)[:n]
        r0_norm = jnp.sqrt(jnp.vdot(r0, r0))
        den = jnp.where(b_norm > 0, b_norm, jnp.where(r0_norm > 0, r0_norm, 1.0))

        norms0 = jnp.full(max_iter + 1, jnp.nan, dtype=b.dtype)
        norms0 = norms0.at[0].set(r0_norm)

        def cond(st):
            i, x, rnorm, norms = st
            return (i < max_iter) & ((rnorm / den >= tol) | (i < min_iter))

        def body(st):
            i, x, rnorm, norms = st
            x = self._vcycle(levels, 0, x, b)
            r = b - ell_spmv(A, x)[:n]
            rnorm = jnp.sqrt(jnp.vdot(r, r))
            return (i + 1, x, rnorm, norms.at[i + 1].set(rnorm))

        i, x, rnorm, norms = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), x0, r0_norm, norms0)
        )
        rel = rnorm / den
        return SolverResult(
            x=x,
            num_iterations=i,
            rel_residual_norm=rel,
            converged=rel < tol,
            res_norms=norms,
        )
