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
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix, ELLMatrix
from ...ops.spmv import ell_spmv
from ...ops.dia import DenseMatrix, GatherOp, ScatterOp, freeze_auto, spmv
from ...ops.transfer import (
    DeferredScatter,
    arena_device_put,
    fast_device_put as arena_fast_put,
    unview,
)
from ...utils.timing import timed
from ..krylov.common import SolverResult
from .coarsen import (
    C_PT,
    cljp_coarsen,
    hmis_coarsen,
    pmis_coarsen,
    ruge_stuben_coarsen,
)
from .interp import (
    classical_interp,
    direct_interp,
    extended_i_interp,
    truncate_interp,
)
from .rap import galerkin_rap, nongalerkin_filter
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

_GS_TYPES = (1, 2, 3, 4, 6, 8, 13, 14)


@dataclasses.dataclass(frozen=True)
class BoomerAMGOptions:
    # setup (par_amg.c defaults)
    max_levels: int = 25
    max_coarse_size: int = 9
    # gather-to-sequential coarse solve (par_amg_setup.c:2893
    # seq_threshold / gen_redcs_mat.c hypre_seqAMGSetup): stop
    # coarsening once n <= seq_threshold and solve that level with ONE
    # V-cycle of a nested sequential BoomerAMG inheriting this
    # config's strength/coarsen/interp/relax settings (MaxIter=1,
    # Tol=0 — gen_redcs_mat.c:156).  On one chip "gather" is a no-op;
    # the semantic survives: the tail hierarchy is built by the serial
    # pipeline and applied as a single nested cycle.  0 = off.
    seq_threshold: int = 0
    strong_threshold: float = 0.25
    max_row_sum: float = 0.9
    coarsen_type: str = "pmis"  # pmis | hmis | rs  (hypre 8 | 10 | 0)
    interp_type: str = "classical"  # classical | direct | ext+i (hypre 0|3|6)
    trunc_factor: float = 0.0
    P_max_elmts: int = 0
    # aggressive coarsening (par_amg.h agg_num_levels; interp built as a
    # two-stage product P1 @ P2, the agg_interp 1/2 family — multipass
    # planned): applied to the first agg_num_levels levels
    agg_num_levels: int = 0
    agg_P_max_elmts: int = 0
    agg_trunc_factor: float = 0.0
    # 4 = multipass (hypre's default, par_multi_interp.c) on the combined
    # two-round CF with the S*S+2S second strength graph; 1 = two-stage
    # product P1@P2
    agg_interp_type: int = 4
    num_paths: int = 1
    # systems AMG, "unknown approach" (par_strength.c:254, par_interp.c
    # dof_func guards): cross-function couplings are invisible to
    # strength and interpolation (skipped entirely, NOT lumped); the
    # Galerkin product and smoothers see the full matrix.  dof_func
    # defaults to interleaved (i % num_functions).
    num_functions: int = 1
    dof_func: Optional[np.ndarray] = None
    # Jacobi interpolation improvement steps applied after P is built
    # (par_jacobi_interp.c, post_interp_type; threshold = hypre's
    # jacobi_trunc_threshold default)
    post_interp_type: int = 0
    jacobi_trunc_threshold: float = 0.01
    # nodal-systems coarsening (par_nodal_systems.c): coarsen the nodal
    # norm matrix (option = norm type) so all functions of a node share
    # one CF decision; interpolation stays unknown-based
    nodal: int = 0
    nodal_diag: int = 0
    # GSMG (par_gsmg.c): geometrically-smooth strength from relaxed
    # random vectors replaces the classical strength test
    gsmg: int = 0
    num_samples: int = 5
    # AIR restriction: R = local ideal restriction instead of P^T;
    # coarse grid = R A P.  restri_type 1 = distance-1 (par_restr.c),
    # 2 = distance-2 (par_lr_restr.c Dist2AIR).  air_neumann_degree >= 0
    # swaps the exact local solves for the degree-k Neumann series (the
    # NeumannAIR family).  For nonsymmetric problems (advection); pair
    # with FCF/F relaxation.
    restrict_type: int = 0
    filter_threshold_r: float = 0.0
    air_neumann_degree: int = -1
    # additive cycling (par_add_cycle.c hypre_BoomerAMGAdditiveCycle):
    # levels in [addlvl, add_last_lvl] restrict the raw residual down,
    # smooth simultaneously, and sum prolongated corrections; levels
    # outside stay multiplicative.  Variants (each value = start level,
    # -1 off; addlvl = max of the three):
    #   additive      — Lambda smoothing (2*Dinv - Dinv*A*Dinv, the
    #                   symmetrized two-sweep Jacobi; CreateLambda)
    #   mult_additive — same smoothing + the solve-phase P replaced by
    #                   C^ns * P, C = I - Dinv*A (par_amg_setup.c:2635
    #                   hypre_CreateC; RAP keeps the ORIGINAL P)
    #   simple        — plain x += Dinv*r (CreateDinv) + smoothed P
    additive: int = -1
    mult_additive: int = -1
    simple: int = -1
    add_last_lvl: int = -1
    # truncation of the smoothed P (SetMultAddPMaxElmts/TruncFactor,
    # par_amg_setup.c:2663 hypre_BoomerAMGTruncandBuild)
    add_P_max_elmts: int = 0
    add_trunc_factor: float = 0.0
    # additive-band smoother scaling (SetAddRelaxType/Wt): 18 = l1
    # (option-1 row |.|-sums), 0 = weighted Jacobi diag/add_rlx_wt
    add_rlx: int = 18
    add_rlx_wt: float = 1.0
    # non-Galerkin coarse-operator sparsification (par_nongalerkin.c
    # role): drop tol applied to coarse levels >= 1 (0 = off).  A tuple
    # gives per-level tolerances (hypre SetLevelNonGalerkinTol; the last
    # entry extends to deeper levels) — production large-grid configs
    # drop harder on deep levels, where the relocated-lattice operators'
    # diagonal unions otherwise explode.
    nongalerkin_tol: object = 0.0
    # dropped-mass placement for levels >= 2 ("diag" | "strong"); the
    # level-1 filter always lumps diagonally (it is fused into the
    # device-side RAP).  "strong" = the reference's neighbor
    # redistribution, which tolerates much larger deep-level tols.
    nongalerkin_lump: str = "diag"
    # smoothing
    relax_down: int = 13
    relax_up: int = 14
    relax_coarse: int = 9  # 9 = Gaussian elimination
    relax_order: int = 0
    relax_weight: float = 1.0
    # per-level smoother weights (par_amg.h relax_weight[max_levels];
    # HYPRE_BoomerAMGSetLevelRelaxWt / ij driver -w <wt> <level>).
    # None = the scalar relax_weight everywhere; a shorter tuple clamps
    # to its last entry for deeper levels.
    level_relax_weights: Optional[tuple] = None
    # outer SOR weight (par_amg.h omega[max_levels]; SetOuterWt /
    # SetLevelOuterWt, ij driver -om <wt> <level>).  Applies to the
    # SOR/SSOR family (relax 3/4/6) via the par_relax.c:1277
    # prod = (1 - w*omega) recurrence (see relax.gauss_seidel); hypre's
    # other smoothers ignore omega, as does its own default 1.0.
    omega: float = 1.0
    level_omegas: Optional[tuple] = None
    num_sweeps: int = 1
    # per-cycle-position sweep counts (HYPRE_BoomerAMGSetCycleNumSweeps
    # k=1/2/3; ij driver -ns_down/-ns_up/-ns_coarse); None = num_sweeps
    num_sweeps_down: Optional[int] = None
    num_sweeps_up: Optional[int] = None
    num_sweeps_coarse: Optional[int] = None
    # old-style per-cycle-position arrays (par_amg.h grid_relax_type[4] /
    # grid_relax_points[4][sweep]; par_cycle.c:288 `relax_type =
    # grid_relax_type[cycle_param]`, :333 `relax_points =
    # grid_relax_points[cycle_param][j]`).  grid_relax_type: 4 ints
    # (finest, down, up, coarsest) overriding relax_down/up/coarse.
    # grid_relax_points: 4 tuples of {0 all, 1 C, -1 F} per sweep; the
    # sweep count per position is the tuple's length
    # (num_grid_sweeps[cycle_param]).
    grid_relax_type: Optional[tuple] = None
    grid_relax_points: Optional[tuple] = None
    # stop coarsening once the next coarse grid would fall below this
    # (HYPRE_BoomerAMGSetMinCoarseSize, ij driver -min_cs)
    min_coarse_size: int = 0
    # absolute-value strength test (HYPRE_BoomerAMGSetSabs,
    # par_strength.c hypre_BoomerAMGCreateSabs)
    strength_abs: bool = False
    cheby_order: int = 2
    cheby_ratio: float = 0.3
    # complex smoothers (par_amg.h smooth_type / smooth_num_levels;
    # par_cycle.c replaces relaxation with the aux smoother on levels
    # below smooth_num_levels):
    #   9 = Euclid parallel ILU(k) over row-block subdomains with the
    #       SubdomainGraph coloring (solvers/amg/euclid.py)
    smooth_type: int = 0
    smooth_num_levels: int = 0
    euclid_domains: int = 4       # Euclid -np analog (subdomain count)
    euclid_fill: int = 1          # Euclid -level (ILU fill)
    euclid_colored: bool = True   # colored block GS vs block Jacobi
    # cycling
    cycle_type: int = 1  # 1 = V, 2 = W (par_cycle.c lev_counter semantics)
    fcycle: bool = False  # F-cycle flag (par_cycle.c:202-206, 613-615)
    seed: int = 2747
    # device precision for the frozen solve-phase hierarchy; setup math
    # stays float64 on host (the --enable-single analog, SURVEY §5)
    dtype: str = "float64"
    # storage dtype for MATRIX data only (A/P/R diagonals, dense blocks);
    # vectors, dinv/l1inv and all accumulation stay in `dtype`.  The
    # cycle is HBM-bound on matrix bytes, so bfloat16 halves per-
    # iteration time; the preconditioner quality loss is tiny (AMG
    # V-cycles tolerate ~0.4% entry perturbations).  None = same as
    # dtype.
    mat_dtype: Optional[str] = None
    # lattice embedding of level 1 (gather-free coarse ops): when the
    # fine matrix is a lattice stencil, lift level-1 A/P/R onto the fine
    # lattice as DIA operators — trades padded bandwidth for eliminating
    # XLA's slow HBM gathers (see ops/dia.py).  Applies only with
    # Jacobi-family smoothers.
    embed_level1: bool = True
    max_embedded_offsets: int = 512
    # lattice relocation of level 2 (requires lattice_shape): relocate
    # the PMIS-chosen level-2 points onto a distinct-cell assignment of
    # the 2x-coarsened lattice (a permutation — identical convergence),
    # making A2 a compact-lattice DIA operator and factoring the level-1
    # transfer operators into parity (octant) DIA sums — no HBM gathers
    # anywhere above level 2.
    relocate_level2: bool = True
    lattice_shape: Optional[tuple] = None  # (nx, ny, nz) of the fine grid
    # when set, A is asserted to be the 7-pt lattice Laplacian with
    # these (cx, cy, cz) coefficients: the device-setup path then
    # SYNTHESIZES the fine DIA table on device (ops/dia.py
    # device_lattice_dia) instead of shipping ~noff*n*itemsize bytes
    # through the host->device link — the par_laplace.c "each rank
    # generates its own rows" stance applied to the accelerator
    lattice_coeffs: Optional[tuple] = None
    relocate_min_n2: int = 6144  # below this L2 is dense-MXU anyway
    # budget for each relocated operator's diagonal storage (offsets *
    # ncells * itemsize).  Bytes — not offset count — is what the
    # streaming kernel pays, and deeper levels afford many more offsets
    # on their smaller lattices.  A sanity cap on total offsets guards
    # the host-side build.
    relocate_max_bytes: int = 3 << 30
    max_relocated_offsets: int = 8192
    # offset budgets for the relocated SOLVE-phase forms (0 = unlimited).
    # Deep Galerkin operators' relocated diagonal unions explode (661/883
    # offsets at 96^3 levels 2/3 — 25-120x the true nnz in storage); the
    # filters below cap them by keeping the heaviest-|mass| offsets and
    # lumping/rescaling row-sum-preservingly (rap.offset_budget_filter
    # for A; dia.parity_offset_budget_filter for P/R).  BOTH DEFAULT OFF
    # — measured on TPU at 96^3 (scripts/eval_reloc_budget.py), the tail
    # offsets carry real mass and truncating them destroys convergence:
    # P-budget 96 -> 16->29 iters at 64^3 and PCG breakdown at 96^3;
    # A-budget 128 -> 200-iter divergence at 96^3 with BOTH "strong"
    # (row-wise, asymmetric) and "diag" (symmetry-preserving) lumping.
    # Offset compression must come from displacement-aware relocation
    # (a pure permutation — zero convergence risk), not entry dropping.
    # The filters are kept for experimentation at higher budgets.
    relocate_offset_budget: int = 0
    transfer_offset_budget: int = 0
    relocate_lump: str = "diag"
    # EXACT hybrid split of the relocated forms: diagonals carrying
    # fewer than tail_min_count(ncells, itemsize) entries move to a
    # COOTail (gather + segment-sum + scatter, ~5 ns/entry on v5e)
    # instead of paying a full ncells-wide streamed lane.  Unlike the
    # budget filters above this drops NOTHING -- the operator is exact,
    # so convergence is untouched; only the evaluation route of the
    # rare-diagonal entries changes (ops/dia.py COOTail).
    relocate_tail: bool = True
    # collapse the ENTIRE sub-V-cycle below the first level with
    # n <= collapse_coarse_n into one precomputed dense operator.  With
    # linear smoothers (Jacobi/l1-Jacobi) and a fixed V(1,1) schedule
    # the sub-cycle applied to a zero initial guess IS a fixed linear
    # map; materializing it (a ~n^2 dense matrix, built bottom-up with
    # ~6 small MXU matmuls per level in one jit) replaces the deep
    # levels' dozens of tiny kernel dispatches -- the measured V-cycle
    # floor once streaming is fixed -- with a single dense matvec.
    # Exact linear algebra: the preconditioner is unchanged up to
    # rounding.  0 disables.
    collapse_coarse_n: int = 2048
    # run the level-0 PMIS independent-set iteration ON DEVICE
    # (solvers/amg/device_coarsen.py — shift-algebra strength + integer-
    # exact measures, CF bit-identical to the host path).  The strength
    # graph is still built host-side for interpolation; this seeds the
    # fully device-resident setup.
    device_coarsen: bool = False
    # compute the level-1 embedded operator ON DEVICE from A0 and the
    # embedded P (ops/device_rap.py) instead of building + transferring
    # the ~97%-zeros dense-diagonal array from the host — the largest
    # single setup cost through a remote-device tunnel.  The hierarchy
    # PATTERN (offsets, filter decisions) stays host-computed.
    device_rap: bool = True
    # run the ENTIRE level-0 setup chain on device (strength -> PMIS ->
    # classical interp + truncation -> two-stage RAP + non-Galerkin
    # filter, ops/device_setup.py): the host pulls back only cf0 (int8)
    # and the compact coarse operator values to continue deeper levels.
    # Applies to lattice stencil operators with pmis + classical +
    # Jacobi-family smoothers; setup math is f32 on device (production
    # path; the host f64 pipeline remains the oracle-parity path).
    # Truncation tie order deviates from hypre's qsort2_abs (lowest
    # offset first) — kept VALUES agree after rescale, the pattern can
    # differ where equal weights straddle the max_elmts cut.
    device_setup: bool = False


@jax.jit
def _pull_offset_rows(data, ks, cpos):
    """A chunk of diagonals of the device A1 table, gathered at the C
    positions as ONE fused [W, nc] gather (no [W, n] intermediate —
    that full-width staging OOMed 256^3).  ks is traced, so every
    chunk shares a single compiled program; wide chunks cut the
    pull's tunnel round trips to one or two dispatches."""
    return data[ks[:, None], cpos[None, :]]


def _updown_relax_types(o) -> set:
    """Effective down/up relax types: grid_relax_type[:3] when the
    old-style array (par_amg.h grid_relax_type[4]) is set, else
    {relax_down, relax_up}."""
    if o.grid_relax_type is not None:
        return set(int(t) for t in o.grid_relax_type[:3])
    return {o.relax_down, o.relax_up}


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
    euclid: Optional[object] = None  # EuclidData (smooth_type 9)
    schwarz: Optional[object] = None  # SchwarzData (smooth_type 6)
    parasails: Optional[object] = None  # ParaSailsData (smooth_type 8)


class BoomerAMG:
    """Setup once; then `.cycle` (jittable), `.solve`, or use as a
    preconditioner callable via `.precond`."""

    def __init__(self, A: CSRMatrix, opts: BoomerAMGOptions = BoomerAMGOptions()):
        self.opts = opts
        self.levels: list[AMGLevel] = []
        self._host_A: list[sp.csr_matrix] = []
        self._host_P: list[sp.csr_matrix] = []
        self._host_R: list = []  # None => R = P^T
        self._cf: list[np.ndarray] = []
        self._host_A1_unf = None
        self._pending_rap = None
        self._fast = None  # device level-0 chain products (device_setup)
        self._setup(A)  # host numpy/scipy hierarchy (levels >= fast depth)
        self._freeze_hierarchy()

    # ------------------------------------------------------------------
    # setup (host)
    # ------------------------------------------------------------------
    @staticmethod
    def _mask_cross_dof(A, dof):
        """Zero couplings between different functions (the "unknown
        approach": par_strength.c:254 and the dof_func guards in every
        interpolation routine skip them entirely)."""
        Ac = A.tocoo(copy=True)
        keep = (dof[Ac.row] == dof[Ac.col]) | (Ac.row == Ac.col)
        Ac.data = np.where(keep, Ac.data, 0.0)
        M = Ac.tocsr()
        M.eliminate_zeros()
        M.sort_indices()
        return M

    def _setup(self, A0: CSRMatrix) -> None:
        o = self.opts
        A = A0.to_scipy().tocsr()
        A.sort_indices()
        # int32 indices + f64 data: scipy's native currency — keeps every
        # downstream SpGEMM on the fast path and lets the native kernels
        # run conversion-free on scipy's own arrays
        if A.indices.dtype != np.int32 and A.shape[0] < np.iinfo(np.int32).max:
            A = sp.csr_matrix(
                (A.data.astype(np.float64, copy=False),
                 A.indices.astype(np.int32), A.indptr.astype(np.int32)),
                shape=A.shape,
            )
            A.has_sorted_indices = True
        nf = o.num_functions
        if o.dof_func is not None:
            dof = np.asarray(o.dof_func, dtype=np.int64)
        else:
            dof = np.arange(A.shape[0], dtype=np.int64) % max(nf, 1)
        with timed("SETUP"):
            fast = self._device_setup_level0(A) if self._fast_eligible(A) else None
            if fast is not None:
                self._fast = fast
                self._host_A.append(A)
                self._host_P.append(None)  # device-resident (lazy pull)
                self._host_R.append(None)
                self._cf.append(fast["cf0"])
                A = fast["A1_host"]
            while True:
                n = A.shape[0]
                self._cur_A = A
                A_si = A if nf <= 1 else self._mask_cross_dof(A, dof)
                last = (len(self._host_A) >= o.max_levels - 1
                        or n <= o.max_coarse_size
                        or (o.seq_threshold > 0 and n <= o.seq_threshold
                            and len(self._host_A) > 0))
                if not last:
                    with timed("STRENGTH"):
                        if o.gsmg > 0:
                            from .strength import gsmg_strength

                            S = gsmg_strength(
                                A_si, o.num_samples, seed=o.seed,
                                dof_func=dof if nf > 1 else None,
                            )
                        elif o.strength_abs:
                            from .strength import strength_matrix_abs

                            # the reference's useSabs call hardwires
                            # max_row_sum = 1.0 and num_functions = 1
                            # (par_amg_setup.c:1040-1045) — the user's
                            # max_row_sum is deliberately ignored here
                            S = strength_matrix_abs(
                                A, o.strong_threshold, 1.0
                            )
                        else:
                            S = strength_matrix(
                                A_si, o.strong_threshold, o.max_row_sum
                            )
                    with timed("COARSEN"):
                        cf_device = None
                        if (
                            o.device_coarsen
                            and len(self._host_A) == 0
                            and nf <= 1
                            and o.coarsen_type == "pmis"
                            and o.gsmg == 0
                            and o.lattice_shape is not None
                        ):
                            from ...ops.dia import csr_offsets, csr_to_dia
                            from .device_coarsen import device_pmis

                            if len(csr_offsets(A.indptr, A.indices, n, n)) <= 48:
                                D0 = csr_to_dia(
                                    CSRMatrix.from_scipy(A), device=False
                                )
                                cf_device = np.asarray(
                                    device_pmis(
                                        D0.data, D0.offsets, n,
                                        seed=o.seed,
                                        theta=o.strong_threshold,
                                        max_row_sum=o.max_row_sum,
                                    )
                                ).astype(np.int64)
                        if cf_device is not None:
                            cf = cf_device
                        elif nf > 1 and o.nodal > 0:
                            from .strength import (
                                create_nodal_A,
                                strength_matrix_abs,
                            )

                            AN = create_nodal_A(A, nf, o.nodal, o.nodal_diag)
                            if o.nodal in (3, 6) or o.nodal_diag > 0:
                                SN = strength_matrix(
                                    AN, o.strong_threshold, o.max_row_sum,
                                )
                            else:
                                SN = strength_matrix_abs(
                                    AN, o.strong_threshold, o.max_row_sum
                                )
                            cfN = self._coarsen(SN)
                            cf = np.repeat(cfN, nf)
                        else:
                            cf = self._coarsen(S)
                    nc = int((cf > 0).sum())
                    if nc == 0 or nc == n or nc < o.min_coarse_size:
                        last = True
                if last:
                    self._host_A.append(A)
                    self._cf.append(np.zeros(A.shape[0], dtype=np.int64))
                    break
                with timed("INTERP"):
                    if len(self._host_A) < o.agg_num_levels and o.agg_interp_type == 4:
                        # aggressive coarsening, hypre default pipeline
                        # (par_amg_setup.c): second coarsening round on
                        # the S*S+2S graph among C points, combined CF,
                        # multipass interpolation on the fine matrix
                        from .interp import multipass_interp
                        from .strength import second_strength

                        S2 = second_strength(S, cf, o.num_paths)
                        if o.coarsen_type == "pmis":
                            # the reference's second round runs PMIS
                            # with CF_init=3 (par_amg_setup.c:1272):
                            # S2-isolated C points STAY coarse
                            cf2 = pmis_coarsen(
                                S2, seed=o.seed, isolated_to_c=True)
                        else:
                            cf2 = self._coarsen(S2)
                            if o.coarsen_type == "hmis":
                                # HMIS second round: measure_type+3 sets
                                # agg_2, keeping S2-isolated points
                                # coarse (par_coarsen.c:960,1141 SC_PT).
                                # Equivalent post-flip: an isolated row
                                # influences no other decision.
                                cf2 = np.where(
                                    np.diff(S2.indptr) == 0, 1, cf2)
                        cidx1 = np.flatnonzero(cf > 0)
                        if 0 < (cf2 > 0).sum() < len(cidx1):
                            cf = np.where(cf > 0, -1, cf).astype(np.int64)
                            cf[cidx1[cf2 > 0]] = 1
                        P = multipass_interp(A_si, S, cf)
                        P = truncate_interp(P, o.agg_trunc_factor, o.agg_P_max_elmts)
                    elif len(self._host_A) < o.agg_num_levels:
                        # aggressive: coarsen twice, interpolate through
                        # the intermediate grid, store the product P
                        P1 = truncate_interp(
                            self._interp(A_si, S, cf), o.trunc_factor, o.P_max_elmts
                        )
                        A_mid = galerkin_rap(A, P1)
                        S2 = strength_matrix(
                            A_mid,
                            o.strong_threshold,
                            o.max_row_sum,
                        )
                        cf2 = self._coarsen(S2)
                        if 0 < (cf2 > 0).sum() < A_mid.shape[0]:
                            P2 = truncate_interp(
                                self._interp(A_mid, S2, cf2),
                                o.trunc_factor,
                                o.P_max_elmts,
                            )
                            P = (P1 @ P2).tocsr()
                            P = truncate_interp(
                                P, o.agg_trunc_factor, o.agg_P_max_elmts
                            )
                            # combined CF: C iff C in both stages
                            cidx1 = np.flatnonzero(cf > 0)
                            cf = np.where(cf > 0, -1, cf).astype(np.int64)
                            cf[cidx1[cf2 > 0]] = 1
                        else:
                            P = P1
                    else:
                        P = self._interp(A_si, S, cf)
                        P = truncate_interp(P, o.trunc_factor, o.P_max_elmts)
                    if o.post_interp_type > 0:
                        from .interp import jacobi_interp

                        P = jacobi_interp(
                            A_si, P, cf, o.post_interp_type,
                            o.jacobi_trunc_threshold,
                        )
                with timed("RAP"):
                    if o.restrict_type > 0:
                        from .interp import air_restriction

                        R = air_restriction(
                            A_si, S, cf, o.filter_threshold_r,
                            distance=min(max(o.restrict_type, 1), 2),
                            neumann_degree=o.air_neumann_degree,
                        )
                        Ac = (R @ (A @ P)).tocsr()
                        Ac.sort_indices()
                    else:
                        R = None  # R = P^T, built at freeze time
                        Ac = galerkin_rap(A, P)
                    if len(self._host_A) == 0:
                        # unfiltered level-1 pattern, needed by the
                        # device-RAP plan (dropped offsets lump on device)
                        self._host_A1_unf = Ac
                    ngt = self._level_ngt(len(self._host_A))
                    if ngt > 0:
                        lump = ("diag" if len(self._host_A) == 0
                                else o.nongalerkin_lump)
                        Ac = nongalerkin_filter(Ac, ngt, lump=lump)
                self._host_A.append(A)
                self._host_P.append(P)
                self._host_R.append(R)
                self._cf.append(cf)
                A = Ac
                if nf > 1:
                    dof = dof[cf > 0]
            self._apply_mult_additive_P()
            self._build_seq_coarse()

    def _build_seq_coarse(self) -> None:
        """The seq_threshold nested coarse AMG (gen_redcs_mat.c:131-157:
        a BoomerAMG inheriting the outer settings, MaxIter 1, Tol 0)."""
        self._seq_coarse = None
        o = self.opts
        Ac = self._host_A[-1]
        if (o.seq_threshold <= 0 or Ac.shape[0] <= o.max_coarse_size
                or len(self._host_A) < 2):
            return
        nested = dataclasses.replace(
            o, seq_threshold=0, device_setup=False, device_rap=False,
            device_coarsen=False, lattice_shape=None, lattice_coeffs=None,
            embed_level1=False, relocate_level2=False,
            additive=-1, mult_additive=-1, simple=-1,
        )
        self._seq_coarse = BoomerAMG(CSRMatrix.from_scipy(Ac.tocsr()), nested)

    def _apply_mult_additive_P(self) -> None:
        """mult_additive/simple solve-phase prolongator smoothing
        (par_amg_setup.c:2485-2665): for levels in [mult_addlvl,
        add_end], P <- C^ns P with C = I - Dinv*A (hypre_CreateC; D =
        option-1 l1 norms for add_rlx 18, diag/add_rlx_wt for 0), then
        hypre_BoomerAMGTruncandBuild truncation.  The coarse operators
        keep the ORIGINAL Galerkin P — only the cycle's P/R change."""
        o = self.opts
        maddlvl = max(o.mult_additive, o.simple)
        if maddlvl < 0:
            return
        L = len(self._host_A)
        add_end = L - 2 if o.add_last_lvl < 0 else min(o.add_last_lvl, L - 2)
        ns = o.num_sweeps_down if o.num_sweeps_down is not None else o.num_sweeps
        for l in range(maddlvl, add_end + 1):
            P = self._host_P[l]
            if P is None:
                continue
            A = self._host_A[l]
            if o.add_rlx == 0:
                d = A.diagonal() / o.add_rlx_wt
            else:
                d = np.asarray(np.abs(A).sum(axis=1)).ravel()
            dinv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
            Dinv = sp.diags(dinv)
            for _ in range(max(int(ns), 1)):
                P = (P - Dinv @ (A @ P)).tocsr()
            if o.add_P_max_elmts or o.add_trunc_factor:
                P = truncate_interp(P, o.add_trunc_factor, o.add_P_max_elmts)
            P.sort_indices()
            # R = P^T picks up the smoothed P at freeze time (hypre
            # replaces P_array, and R_array aliases it unless AIR set
            # an explicit R — which stays untouched, as in hypre)
            self._host_P[l] = P

    # ------------------------------------------------------------------
    # device-resident level-0 setup (ops/device_setup.py)
    # ------------------------------------------------------------------
    def _fast_eligible(self, A) -> bool:
        o = self.opts
        if not o.device_setup or o.lattice_shape is None:
            return False
        if o.num_functions > 1 or o.gsmg or o.nodal or o.agg_num_levels:
            return False
        if o.coarsen_type != "pmis" or o.interp_type != "classical":
            return False
        if (o.post_interp_type or o.restrict_type or o.seq_threshold > 0
                or max(o.additive, o.mult_additive, o.simple) >= 0):
            return False
        if (_updown_relax_types(o) - {0, 7, 18} or o.smooth_num_levels
                or o.grid_relax_points is not None):
            return False
        n, m = A.shape
        shape = tuple(int(s) for s in o.lattice_shape)
        if n != m or int(np.prod(shape)) != n or A.nnz == 0:
            return False
        if o.max_levels < 3 or n <= o.max_coarse_size:
            return False
        from ...ops.dia import csr_offsets

        return len(csr_offsets(A.indptr, A.indices, n, n)) <= 48

    def _device_setup_level0(self, A):
        """Run strength -> PMIS -> classical interp -> RAP for level 0
        on device; pull back cf0 + compact A1 for the host continuation.
        Returns the fast-path dict or None (e.g. degenerate CF)."""
        import jax as _jax

        from ...ops.device_setup import (
            device_classical_interp,
            device_rap,
            device_row_stats,
        )
        from ...ops.dia import DIAMatrix, csr_to_dia
        from .device_coarsen import lattice_pmis_host

        o = self.opts
        n = A.shape[0]
        # setup math in `dtype` (f32 production / f64 when x64 is on —
        # the untruncated device interp is then BITWISE the host path)
        with timed("DS_SHIP_A0"):
            D0 = None
            if o.lattice_coeffs is not None:
                from ...ops.dia import device_lattice_dia

                D0 = device_lattice_dia(
                    o.lattice_shape, o.lattice_coeffs, np.dtype(o.dtype)
                )
            if D0 is None:
                D0 = csr_to_dia(
                    CSRMatrix.from_scipy(A), dtype=np.dtype(o.dtype),
                    device=True,
                )
            jax.block_until_ready(D0.data)
        # Each stage is SYNCED before the next is dispatched: through
        # the remote-device tunnel, a dispatch whose inputs are still
        # in-flight promises serializes pathologically in the client
        # (measured: pmis+interp+readback = 0.9 s when staged, 15-200 s
        # when the interp dispatch precedes the cf readback).  Setup
        # runs once — pipelining buys nothing and costs unboundedly.
        with timed("DS_PMIS"):
            # PMIS runs on the HOST (numpy twin of the device program,
            # bitwise-identical CF): the jitted while_loop's DISPATCH
            # was measured to stall 70-600+ s through a degraded axon
            # compile service even with a warm persistent cache, while
            # the chain's other programs load in <1 s; the numpy twin
            # costs ~0.5 s at 884k rows, unconditionally.  device_pmis
            # itself remains the mesh-sharded path (dist_setup.py).
            with timed("DS_PMIS_DIA"):
                D0h = csr_to_dia(
                    CSRMatrix.from_scipy(A), dtype=np.dtype(o.dtype),
                    device=False,
                )
            with timed("DS_PMIS_HOST"):
                cf0_np = lattice_pmis_host(
                    D0h.data, D0h.offsets, n, seed=o.seed,
                    theta=o.strong_threshold, max_row_sum=o.max_row_sum,
                )
            cf0 = cf0_np.astype(np.int64)
            # int32, NOT int8: the axon tunnel's int8 device_put path is
            # pathological (measured 13-270+ s for 0.9 MB vs 0.15 s for
            # the 4x-bigger int32 image — the recurring DS_PMIS stall)
            with timed("DS_PMIS_PUT"):
                cf_dev = arena_fast_put(cf0_np.astype(np.int32))
        nc = int((cf0 > 0).sum())
        if nc == 0 or nc == n:
            return None
        with timed("DS_INTERP"):
            P_data, rowmaxP = device_classical_interp(
                D0.data, cf_dev, offsets=D0.offsets,
                theta=o.strong_threshold, max_row_sum=o.max_row_sum,
                trunc_factor=o.trunc_factor, max_elmts=o.P_max_elmts,
            )
            rmP = np.asarray(rowmaxP)
            jax.block_until_ready(P_data)
        keepP = [k for k in range(len(D0.offsets)) if rmP[k] > 0]
        offs_P = tuple(D0.offsets[k] for k in keepP)
        P_dia = DIAMatrix(
            data=P_data[np.asarray(keepP, dtype=np.int32)],
            offsets=offs_P, num_rows=n, num_cols=n,
        )
        del P_data  # free the unselected full table (~0.5 GB at 256^3)
        with timed("DS_RAP"):
            A1_data, offs_1 = device_rap(P_dia, D0, tol=self._level_ngt(0))
            jax.block_until_ready(A1_data)
        A1_dia = DIAMatrix(
            data=A1_data, offsets=offs_1, num_rows=n, num_cols=n
        )
        with timed("DS_STATS"):
            dinv1, l1inv1 = device_row_stats(A1_data, offsets=offs_1)
            jax.block_until_ready((dinv1, l1inv1))

        # compact coarse operator -> host (deeper levels stay host)
        cpos0 = np.flatnonzero(cf0 > 0).astype(np.int64)
        with timed("DS_A1_PULL"):
            # per-offset pulls: the one-shot [noff1, n1] device gather
            # plus its transfer staging OOMed a 256^3 setup whose HBM
            # already holds the f32 chain products; row-at-a-time peaks
            # at one [n1] buffer and costs only noff1 round trips.  The
            # offset index is a TRACED scalar so all noff1 pulls share
            # ONE compiled program (a static k would compile a fresh
            # gather per offset — ~20 compile-service round trips, each
            # unbounded in a degraded window).
            cpos_dev = arena_fast_put(cpos0)
            noff1 = int(A1_data.shape[0])
            # chunk width sized to cap the [W, nc] staging at ~64MB:
            # one dispatch at 96^3, a handful at 256^3
            W = max(8, min(noff1, int(64e6 // max(nc * 4, 1))))
            chunks = []
            for k0 in range(0, noff1, W):
                ks = np.arange(k0, k0 + W, dtype=np.int32)
                ks = np.minimum(ks, noff1 - 1)  # pad by repeating last
                chunks.append(np.asarray(
                    _pull_offset_rows(A1_data, jnp.asarray(ks), cpos_dev)
                ))
            A1c = np.concatenate(chunks)[:noff1]
        with timed("DS_A1_REBUILD"):
            # vectorized coarse-CSR assembly.  rank[g] = coarse index of
            # fine row g (direct O(1) lookup; searchsorted per offset was
            # the 4-5 s hot spot here).  For a fixed coarse row i the
            # targets i+off are ascending in off, so flattening the
            # [nc, noff1] transpose row-major yields canonical
            # (sorted, duplicate-free) CSR with no sort pass.
            rank = np.full(n, -1, dtype=np.int32)
            rank[cpos0] = np.arange(nc, dtype=np.int32)
            offs_arr = np.asarray(offs_1, dtype=np.int64)
            tgt = cpos0[None, :] + offs_arr[:, None]        # [noff1, nc]
            inb = (tgt >= 0) & (tgt < n)
            pos_c = rank[np.where(inb, tgt, 0)]
            sel = inb & (pos_c >= 0) & (A1c != 0)
            selT = sel.T
            indptr = np.zeros(nc + 1, dtype=np.int32)
            indptr[1:] = np.cumsum(selT.sum(axis=1), dtype=np.int64)
            flat = selT.ravel()
            A1_host = sp.csr_matrix(
                (A1c.T.ravel()[flat].astype(np.float64),
                 pos_c.T.ravel()[flat].astype(np.int32), indptr),
                shape=(nc, nc),
            )
            A1_host.has_sorted_indices = True
        return dict(
            D0=D0, P=P_dia, A1=A1_dia, cf0=cf0, cpos0=cpos0,
            A1_host=A1_host, dinv1=dinv1, l1inv1=l1inv1,
        )

    def _host_P0(self):
        """Lazy host materialization of the fast path's level-0 P
        (SolveT / ParAMG / AMG-DD need a scipy P)."""
        if self._host_P[0] is not None or self._fast is None:
            return self._host_P[0]
        f = self._fast
        P = f["P"]
        n = P.num_rows
        cpos0 = f["cpos0"]
        data = np.asarray(P.data)[:, :n]
        rows_l, cols_l, vals_l = [], [], []
        for k, off in enumerate(P.offsets):
            tgt = np.arange(n, dtype=np.int64) + int(off)
            pos = np.searchsorted(cpos0, np.clip(tgt, 0, None))
            pos_c = np.minimum(pos, len(cpos0) - 1)
            valid = (tgt >= 0) & (tgt < n) & (cpos0[pos_c] == tgt)
            v = data[k]
            sel = valid & (v != 0)
            rows_l.append(np.flatnonzero(sel))
            cols_l.append(pos_c[sel])
            vals_l.append(v[sel].astype(np.float64))
        Ph = sp.csr_matrix(
            (np.concatenate(vals_l),
             (np.concatenate(rows_l), np.concatenate(cols_l))),
            shape=(n, len(cpos0)),
        )
        Ph.sum_duplicates()
        Ph.sort_indices()
        self._host_P[0] = Ph
        return Ph

    def host_P(self, l: int):
        """Host scipy P at level l (materializes the device-resident
        level-0 P of the fast path on first request)."""
        if l == 0 and self._host_P and self._host_P[0] is None:
            return self._host_P0()
        return self._host_P[l]

    def _level_ngt(self, level: int) -> float:
        """Per-level non-Galerkin drop tol; level = index of the FINE
        side of the RAP producing level+1 (0 -> the filter on A_1)."""
        t = self.opts.nongalerkin_tol
        if isinstance(t, (tuple, list, np.ndarray)):
            if len(t) == 0:
                return 0.0
            return float(t[min(level, len(t) - 1)])
        return float(t)

    def _coarsen(self, S):
        o = self.opts
        if o.coarsen_type == "pmis":
            return pmis_coarsen(S, seed=o.seed)
        if o.coarsen_type == "hmis":
            return hmis_coarsen(S, seed=o.seed)
        if o.coarsen_type == "rs":
            return ruge_stuben_coarsen(S)
        if o.coarsen_type == "cljp":
            return cljp_coarsen(S, seed=o.seed)
        if o.coarsen_type == "cr":
            from .coarsen import cr_coarsen

            return cr_coarsen(self._cur_A, seed=o.seed)
        if o.coarsen_type == "cgc":
            # CGC (par_cgc_coarsen.c, Griebel/Metsch): builds several
            # RS coarsenings per PROCESSOR subdomain and picks the
            # combination minimizing a cross-subdomain weight via graph
            # matching.  On a single domain (np=1 semantics — our host
            # setup) the choice set is a single RS grid, to which CGC
            # provably degenerates.
            return ruge_stuben_coarsen(S)
        if o.coarsen_type == "falgout":
            from .coarsen import falgout_coarsen

            return falgout_coarsen(S, seed=o.seed)
        from ...utils.errors import arg_error

        raise arg_error(f"unknown coarsen_type {o.coarsen_type}")

    def _interp(self, A, S, cf):
        o = self.opts
        from .interp import (
            extended_interp,
            ff_interp,
            multipass_interp,
            standard_interp,
        )

        fn = {
            "classical": classical_interp,
            "direct": direct_interp,
            "ext+i": extended_i_interp,
            "multipass": multipass_interp,
            "standard": standard_interp,
            "standard-sep": lambda A, S, cf: standard_interp(A, S, cf, sep_weight=True),
            "ff": ff_interp,
            "ff1": lambda A, S, cf: ff_interp(A, S, cf, ff1=True),
            "ext": extended_interp,
        }[o.interp_type]
        return fn(A, S, cf)

    def _freeze_hierarchy(self) -> None:
        """Plan lattice embedding/relocation, freeze every level ONCE into
        its final form with numpy leaves, then ship the whole hierarchy in
        a single batched jax.device_put.  (Round-1 shape: freeze-then-
        replace built large ELL/DIA forms that embedding immediately threw
        away, and issued ~100 individual host->device transfers whose
        per-call RTT through remote-device tunnels dominated setup.)"""
        L = len(self._host_A)
        if self._fast is not None:
            cpos0 = self._fast["cpos0"]
        else:
            cpos0 = self._plan_embed()
        reloc = self._plan_reloc(cpos0) if cpos0 is not None else []
        skip_A = set([1] if cpos0 is not None else [])
        skip_PR = set([0] if cpos0 is not None else [])
        if self._fast is not None:
            skip_A.add(0)  # level-0 A is the already-device DIA form
        for ent in reloc:
            skip_A.add(ent["k"])
            skip_PR.add(ent["k"] - 1)
        # Freeze everything on the host (relocated/parity forms stay
        # compact DeferredScatter descriptions — never materialized
        # here), then ship the WHOLE hierarchy through ONE packed byte
        # arena + one jitted unpack.  Remote-attached devices charge a
        # fixed ~60-75ms round trip per transfer call; the round-2
        # worker-thread pipeline still paid it per level field (~150
        # leaf transfers = 11.5s of a 96^3 setup on a congested link).
        with timed("FREEZE"):
            for k in range(L):
                A = self._host_A[k]
                P = self._host_P[k] if k < L - 1 else None
                R = (self._host_R[k] if k < L - 1 else None)
                cf = self._cf[k]
                lvl = self._freeze_level(
                    A, P, R, cf if k < L - 1 else None,
                    skip_A=k in skip_A, skip_PR=k in skip_PR,
                    coarsest=(k == L - 1),
                )
                self.levels.append(lvl)
            if self._fast is not None:
                will_reloc_l2 = any(ent["k"] == 2 for ent in reloc)
                self._install_fast_levels(will_reloc_l2)
            elif cpos0 is not None:
                will_reloc_l2 = any(ent["k"] == 2 for ent in reloc)
                self._build_embed_level1(cpos0, will_reloc_l2)
            if reloc:
                self._build_relocated(cpos0, reloc)
        with timed("TRANSFER"):
            self.levels = list(arena_device_put(tuple(self.levels)))
            jax.block_until_ready(jax.tree.leaves(self.levels))
        with timed("DEVICE_FINALIZE"):
            if self._pending_rap is not None:
                self._run_device_rap()
        with timed("COLLAPSE"):
            self._build_coarse_collapse()

    def _run_device_rap(self) -> None:
        """Materialize the level-1 embedded operator on device (see
        ops/device_rap.py) from the already-transferred A0 and embedded
        P0 — replaces shipping the ~97%-zeros diagonal array."""
        from ...ops.device_rap import dia_transpose_device, embedded_rap_device
        from ...ops.dia import DIAMatrix

        p = self._pending_rap
        self._pending_rap = None
        P0emb = unview(self.levels[0].P)
        self.levels[0] = dataclasses.replace(
            self.levels[0],
            R=dia_transpose_device(P0emb, P0emb.data.shape[1]),
        )
        data, _, _ = embedded_rap_device(
            P0emb, unview(self.levels[0].A),
            p["plan"], p["tol"], p["width"], p["mdt"],
        )
        n0 = self.levels[0].A.num_rows
        self.levels[1] = dataclasses.replace(
            self.levels[1],
            A=DIAMatrix(
                data=data, offsets=p["offsets"], num_rows=n0, num_cols=n0
            ),
        )

    @staticmethod
    def _l1_norms(A) -> np.ndarray:
        """Row-wise sum of |a_ij| (reduceat — ufunc.at is ~20x slower)."""
        n = A.shape[0]
        if A.nnz == 0:
            return np.zeros(n)
        starts = np.minimum(A.indptr[:-1], A.nnz - 1)
        red = np.add.reduceat(np.abs(A.data), starts)
        return np.where(np.diff(A.indptr) > 0, red, 0.0)

    def _freeze_level(
        self, A, P, R, cf, skip_A: bool = False, skip_PR: bool = False,
        fine: bool | None = None, coarsest: bool | None = None,
    ) -> AMGLevel:
        o = self.opts
        dt = np.dtype(o.dtype)
        # matrix-data storage dtype: the FINE operator keeps full `dtype`
        # (it defines the residual the Krylov solver minimizes); coarse
        # operators and all transfers live inside the preconditioner and
        # may be stored narrower (mat_dtype)
        if fine is None:
            fine = len(self.levels) == 0
        mdt = dt if fine else np.dtype(o.mat_dtype or o.dtype)
        pdt = np.dtype(o.mat_dtype or o.dtype)
        Ah = CSRMatrix.from_scipy(A)
        n = A.shape[0]
        diag = A.diagonal()
        safe = np.where(diag == 0, 1.0, diag)
        dinv = np.where(diag == 0, 0.0, 1.0 / safe)
        l1 = self._l1_norms(A)
        l1inv = np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1.0, l1))
        if R is None and P is not None and not skip_PR:
            R = P.T.tocsr()

        if coarsest is None:
            coarsest = P is None
        if o.grid_relax_type is not None:
            relax_types = (set(int(t) for t in o.grid_relax_type[:3])
                           if not coarsest
                           else {int(o.grid_relax_type[3])})
        else:
            relax_types = ({o.relax_down, o.relax_up} if not coarsest
                           else {o.relax_coarse})
        need_gs = bool(relax_types & set(_GS_TYPES))
        # option-4 l1 divisor degenerates to |diag| on one partition;
        # sign follows the diagonal (ams.c:642-660)
        gs_div = np.where(diag == 0, 1.0, diag)

        gs_fwd = gs_bwd = None
        grp_cf = (o.grid_relax_points is not None
                  and any(p for pos in o.grid_relax_points for p in pos))
        if need_gs and not coarsest:
            if (o.relax_order == 1 or grp_cf) and cf is not None:
                # CF-ordered sweeps (par_cycle.c:398): store (C, F)
                # schedule pairs per direction
                cm = cf > 0
                gs_fwd = (
                    build_gs_schedule(Ah, True, gs_div, mask=cm),
                    build_gs_schedule(Ah, True, gs_div, mask=~cm),
                )
                gs_bwd = (
                    build_gs_schedule(Ah, False, gs_div, mask=cm),
                    build_gs_schedule(Ah, False, gs_div, mask=~cm),
                )
            else:
                gs_fwd = build_gs_schedule(Ah, forward=True, divisor=gs_div)
                gs_bwd = build_gs_schedule(Ah, forward=False, divisor=gs_div)

        cheby = None
        if 16 in relax_types and not coarsest:
            cheby = cheby_setup(Ah, o.cheby_order, o.cheby_ratio)

        schwarz = parasails = None
        aux_here = not coarsest and len(self.levels) < o.smooth_num_levels
        if o.smooth_type == 6 and aux_here:
            # par_cycle.c smooth_type 6: HYPRE_SchwarzSolve as the level
            # smoother (schwarz.c); RAS over contiguous row blocks
            from .schwarz import SchwarzOptions, build_schwarz_data

            schwarz = build_schwarz_data(
                CSRMatrix.from_scipy(A), SchwarzOptions())
        if o.smooth_type == 8 and aux_here:
            # par_cycle.c smooth_type 8: HYPRE_ParaSailsSolve (FSAI)
            from .parasails import ParaSailsOptions, build_parasails_data

            parasails = build_parasails_data(
                CSRMatrix.from_scipy(A), ParaSailsOptions())
        euclid = None
        if (
            o.smooth_type == 9
            and not coarsest
            and len(self.levels) < o.smooth_num_levels
        ):
            from .euclid import build_euclid

            euclid = build_euclid(
                A, num_domains=o.euclid_domains,
                fill_level=o.euclid_fill, colored=o.euclid_colored,
            )

        coarse_inv = None
        if coarsest and getattr(self, "_seq_coarse", None) is None:
            coarse_inv = np.linalg.pinv(A.toarray(), rcond=1e-12).astype(dt)

        # numpy leaves throughout — _freeze_hierarchy ships the whole
        # hierarchy to device in one batched put
        return AMGLevel(
            A=None if skip_A else freeze_auto(Ah, dtype=mdt, device=False),
            dinv=dinv.astype(dt),
            l1inv=l1inv.astype(dt),
            cmask=(cf > 0) if cf is not None else np.zeros(n, bool),
            P=None if (P is None or skip_PR)
            else freeze_auto(CSRMatrix.from_scipy(P), dtype=pdt, device=False),
            R=None if (R is None or skip_PR)
            else freeze_auto(CSRMatrix.from_scipy(R), dtype=pdt, device=False),
            gs_fwd=gs_fwd,
            gs_bwd=gs_bwd,
            cheby=cheby,
            coarse_inv=coarse_inv,
            euclid=euclid, schwarz=schwarz, parasails=parasails,
        )

    def _plan_embed(self):
        """Return cpos0 (level-1 point positions on the fine lattice) if
        the level-1 embedding applies, else None.  Pure planning — gating
        conditions mirror what the build would need, nothing is built."""
        from ...ops.dia import embedded_offset_count

        o = self.opts
        if not o.embed_level1 or len(self._host_A) < 3:
            return None
        if (_updown_relax_types(o) - {0, 7, 18}
                or o.grid_relax_points is not None):
            return None  # embedded smoothing implemented for Jacobi family only
        if o.smooth_num_levels > 0:
            return None  # aux smoothers operate on the compact layout
        # fine operator must itself freeze to DIA (freeze_auto's criteria:
        # square, above the dense threshold, few distinct diagonals)
        A0 = self._host_A[0]
        n0, m0 = A0.shape
        if n0 != m0 or n0 <= 6144 or A0.nnz == 0:
            return None
        from ...ops.dia import csr_offsets

        if len(csr_offsets(A0.indptr, A0.indices, n0, m0)) > 48:
            return None
        cpos0 = np.flatnonzero(self._cf[0] > 0).astype(np.int64)
        if embedded_offset_count(self._host_A[1], cpos0, cpos0) > o.max_embedded_offsets:
            return None
        return cpos0

    def _build_embed_level1(self, cpos0, will_reloc_l2: bool = False) -> None:
        """Lift level-1 ops onto the fine lattice (gather-free DIA)."""
        from ...ops.dia import GatherOp, ScatterOp, build_embedded_dia

        o = self.opts
        dt = np.dtype(o.dtype)
        mdt = np.dtype(o.mat_dtype or o.dtype)
        pdt = mdt
        n0 = self._host_A[0].shape[0]
        A1 = self._host_A[1]
        P0 = self._host_P[0]
        idx = np.arange(n0, dtype=np.int64)

        use_device_rap = o.device_rap and self._host_A1_unf is not None
        lvl0, lvl1 = self.levels[0], self.levels[1]
        P_emb = build_embedded_dia(P0, idx, cpos0, n0, mdt, device=False,
                                   defer=True)
        # R = P^T is a pure diagonal permutation — derived on device
        # (bitwise the host values) when the device-RAP path is on
        R_emb = None if use_device_rap else build_embedded_dia(
            P0.T.tocsr(), cpos0, idx, n0, mdt, device=False, defer=True
        )
        lvl0 = dataclasses.replace(lvl0, P=P_emb, R=R_emb)

        diag1 = A1.diagonal()
        dinv_e = np.zeros(n0, dtype=dt)
        dinv_e[cpos0] = np.where(diag1 == 0, 0.0, 1.0 / np.where(diag1 == 0, 1, diag1))
        l1 = self._l1_norms(A1)
        l1inv_e = np.zeros(n0, dtype=dt)
        l1inv_e[cpos0] = np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1, l1))
        cmask_e = np.zeros(n0, dtype=bool)
        cmask_e[cpos0[self._cf[1] > 0]] = True

        # level-1 transfers: wrap the compact frozen P1/R1 in embed-aware
        # Scatter/Gather ops.  Skipped entirely when relocation of level 2
        # will overwrite levels[1].P/R with parity mats.
        new_P = new_R = None
        if self._host_P[1:] and not will_reloc_l2:
            innerP, innerR = lvl1.P, lvl1.R
            if innerP is None:  # was skipped in the freeze loop
                P1 = self._host_P[1]
                R1 = self._host_R[1]
                if R1 is None:
                    R1 = P1.T.tocsr()
                innerP = freeze_auto(CSRMatrix.from_scipy(P1), dtype=pdt, device=False)
                innerR = freeze_auto(CSRMatrix.from_scipy(R1), dtype=pdt, device=False)
            cpos_i32 = cpos0.astype(np.int32)
            new_P = ScatterOp(inner=innerP, pos=cpos_i32, n_out=n0)
            new_R = GatherOp(inner=innerR, pos=cpos_i32)
        # _host_A1_unf is set exactly when level 1 came from the
        # R = P^T Galerkin branch — the product the device re-derives
        if use_device_rap:
            # level-1 operator VALUES come from the device (A0 and the
            # embedded P are on device anyway); only the symbolic plan is
            # host work.  dinv/l1inv/cmask stay host-exact (f64).
            from ...ops.device_rap import plan_embedded_rap
            from ...ops.dia import _dia_width, embedded_offsets

            idx64 = np.arange(n0, dtype=np.int64)
            offs_P = embedded_offsets(P0, idx64, cpos0)
            A0h = self._host_A[0]
            offs_A = embedded_offsets(A0h, idx64, idx64)
            offs_unf = embedded_offsets(self._host_A1_unf, cpos0, cpos0)
            offs_filt = embedded_offsets(A1, cpos0, cpos0)
            plan = plan_embedded_rap(offs_P, offs_A, offs_unf, offs_filt)
            width = _dia_width(n0, n0, offs_filt, mdt.itemsize)
            self._pending_rap = dict(
                plan=plan, tol=self._level_ngt(0), width=width,
                mdt=mdt, offsets=tuple(int(x) for x in offs_filt),
            )
            A_emb = None  # materialized in _run_device_rap after transfer
        else:
            # the embedded [noff, width] diagonal array is ~97% zeros:
            # keep the COMPACT (diag, pos, val) triple as a
            # DeferredScatter — it rides the single arena transfer and
            # expands with one scatter inside the arena-unpack program
            from ...ops.dia import DIAMatrix, _dia_width, embedded_offsets
            from ...ops.transfer import DeferredScatter

            offs_e = embedded_offsets(A1, cpos0, cpos0)
            A1c = A1.tocoo()
            off_of = cpos0[A1c.col] - cpos0[A1c.row]
            width = _dia_width(n0, n0, offs_e, mdt.itemsize)
            koff = np.searchsorted(offs_e, off_of).astype(np.int64)
            A_emb = DIAMatrix(
                data=DeferredScatter.build(
                    koff * width + cpos0[A1c.row],
                    A1c.data.astype(mdt),
                    (len(offs_e), width),
                ),
                offsets=tuple(int(x) for x in offs_e),
                num_rows=n0,
                num_cols=n0,
            )
        lvl1 = dataclasses.replace(
            lvl1,
            A=A_emb,
            dinv=dinv_e,
            l1inv=l1inv_e,
            cmask=cmask_e,
            P=new_P,
            R=new_R,
        )
        self.levels[0] = lvl0
        self.levels[1] = lvl1

    def _install_fast_levels(self, will_reloc_l2: bool = False) -> None:
        """Install the device-setup chain's level-0/1 forms (the
        device_setup analog of _build_embed_level1: same level shapes,
        but A0/P0/R0/A1 are already device-resident DIA arrays)."""
        from ...ops.device_rap import dia_transpose_device
        from ...ops.dia import (
            DIAMatrix,
            GatherOp,
            ScatterOp,
            _dia_width,
            freeze_auto,
        )

        o = self.opts
        f = self._fast
        dt = np.dtype(o.dtype)
        mdt = np.dtype(o.mat_dtype or o.dtype)
        D0, P_dia, A1_dia = f["D0"], f["P"], f["A1"]
        n0 = D0.num_rows
        cpos0 = f["cpos0"]

        def pad_cast(M, cast):
            w = _dia_width(M.num_rows, M.num_cols, M.offsets, cast.itemsize)
            d = M.data[:, :M.num_rows].astype(cast)
            if w > d.shape[1]:
                d = jnp.pad(d, ((0, 0), (0, w - d.shape[1])))
            return DIAMatrix(
                data=d, offsets=M.offsets,
                num_rows=M.num_rows, num_cols=M.num_cols,
            )

        lvl0, lvl1 = self.levels[0], self.levels[1]
        P0s = pad_cast(P_dia, mdt)
        lvl0 = dataclasses.replace(
            lvl0,
            A=pad_cast(D0, dt),
            P=P0s,
            R=dia_transpose_device(P0s, P0s.data.shape[1]),
        )

        # level-1 embedded stats: host-exact from the pulled compact A1
        A1h = self._host_A[1]
        diag1 = A1h.diagonal()
        dinv_e = np.zeros(n0, dtype=dt)
        dinv_e[cpos0] = np.where(
            diag1 == 0, 0.0, 1.0 / np.where(diag1 == 0, 1, diag1)
        )
        l1 = self._l1_norms(A1h)
        l1inv_e = np.zeros(n0, dtype=dt)
        l1inv_e[cpos0] = np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1, l1))
        cmask_e = np.zeros(n0, dtype=bool)
        cmask_e[cpos0[self._cf[1] > 0]] = True

        new_P = new_R = None
        if len(self._host_P) > 1 and not will_reloc_l2:
            innerP, innerR = lvl1.P, lvl1.R
            if innerP is None:
                P1 = self._host_P[1]
                R1 = self._host_R[1]
                if R1 is None:
                    R1 = P1.T.tocsr()
                innerP = freeze_auto(CSRMatrix.from_scipy(P1), dtype=mdt, device=False)
                innerR = freeze_auto(CSRMatrix.from_scipy(R1), dtype=mdt, device=False)
            cpos_i32 = cpos0.astype(np.int32)
            new_P = ScatterOp(inner=innerP, pos=cpos_i32, n_out=n0)
            new_R = GatherOp(inner=innerR, pos=cpos_i32)
        lvl1 = dataclasses.replace(
            lvl1,
            A=pad_cast(A1_dia, mdt),
            dinv=dinv_e,
            l1inv=l1inv_e,
            cmask=cmask_e,
            P=new_P,
            R=new_R,
        )
        self.levels[0] = lvl0
        self.levels[1] = lvl1
        # the frozen levels now hold the (cast) solve copies; drop the
        # f32 chain products so HBM is not double-charged (~2.5 GB at
        # 256^3: A1 f32 table + fine table).  P stays -- _host_P0
        # materializes ParAMG/SolveT transfers from it lazily.
        f["A1"] = None
        f["D0"] = None

    def _build_coarse_collapse(self) -> None:
        """Materialize the sub-V-cycle below the first small level as one
        dense operator and truncate the frozen hierarchy there (see
        BoomerAMGOptions.collapse_coarse_n).

        The V-cycle below level ls, applied to a zero initial guess, is
        the fixed linear map
            M_l = post(I - A X) . [X + P M_{l+1} R (I - A X)],
            X = pre-smooth polynomial, bottom M_{L-1} = pinv(A)
        for the linear smoothers (relax 0/5/7/18: x += w*div*(f - Ax)).
        We evaluate the recurrence bottom-up with dense MXU matmuls in
        one jit and install the result as levels[ls].coarse_inv, so the
        cycle state machine's existing relax_coarse=9 branch applies it
        as the coarse solve.  Exact linear algebra -- the preconditioner
        changes only by f32 rounding; what it removes is the deep
        levels' per-op dispatch floor (measured ~the entire gap between
        cycle time and streaming time at 96^3 once tails landed).
        Reference role: par_cycle.c's recursion below small levels +
        par_relax.c relax 9; the collapse itself is TPU-native (the
        reference has no reason to do this -- its kernel launches are
        cheap relative to its levels)."""
        o = self.opts
        if (o.collapse_coarse_n <= 0 or o.cycle_type != 1 or o.fcycle
                or max(o.additive, o.mult_additive, o.simple) >= 0
                or o.seq_threshold > 0
                or o.relax_order == 1
                or o.relax_coarse != 9 or o.smooth_num_levels > 0
                or o.grid_relax_type is not None
                or o.grid_relax_points is not None
                or not {o.relax_down, o.relax_up} <= {0, 5, 7, 18}
                or (o.num_sweeps_down or o.num_sweeps) != o.num_sweeps
                or (o.num_sweeps_up or o.num_sweeps) != o.num_sweeps):
            return
        L = len(self._host_A)
        reloc_map = getattr(self, "_reloc_cells", {})

        def _ls_ok(l: int) -> bool:
            if self._host_A[l].shape[0] > o.collapse_coarse_n:
                return False
            if l in reloc_map:
                return True  # handled by the gather/scatter wrap below
            lv = self.levels[l]
            # the collapsed map is built in HOST indexing: a frozen
            # level living on an embedded lattice (level-1 embed) or
            # any non-host layout cannot take it directly
            if lv.A is not None and lv.A.num_rows != self._host_A[l].shape[0]:
                return False
            Rprev = self.levels[l - 1].R
            if (Rprev is not None
                    and getattr(Rprev, "num_rows", None)
                    not in (None, self._host_A[l].shape[0])):
                return False
            return True

        ls = next((l for l in range(1, L - 1) if _ls_ok(l)), None)
        if ls is None or self.levels[-1].coarse_inv is None:
            return
        if any(self.levels[l].euclid is not None for l in range(ls, L)):
            return
        dt = np.dtype(o.dtype)
        sweeps = o.num_sweeps

        def _dense_deferred(S, shape):
            # ship the sparse matrix's nnz, materialize the dense image
            # on device (the collapse levels are sparse: shipping dense
            # f32 images moved ~25MB of mostly zeros at 96^3)
            C = S.tocoo()
            idx = C.row.astype(np.int64) * shape[1] + C.col
            return DeferredScatter.build(idx, C.data.astype(dt), shape)

        mats = []
        for l in range(ls, L - 1):
            Ah = self._host_A[l]
            Ph = self._host_P[l]
            Rh = self._host_R[l]
            Rs = Rh if Rh is not None else Ph.T.tocsr()
            diag = Ah.diagonal()
            dinv = np.where(diag == 0, 0.0, 1.0 / np.where(diag == 0, 1.0, diag))
            l1 = self._l1_norms(Ah)
            l1inv = np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1.0, l1))
            n_l, nc_l = Ph.shape
            wl = self._level_weight(l)  # relax_weight[level] parity
            mats.append((
                _dense_deferred(Ah, (n_l, n_l)),
                _dense_deferred(Ph, (n_l, nc_l)),
                _dense_deferred(Rs, (nc_l, n_l)),
                (wl * (l1inv if o.relax_down == 18 else dinv)).astype(dt),
                (wl * (l1inv if o.relax_up == 18 else dinv)).astype(dt),
            ))
        # one compact ship for every collapse operand (16 individual
        # synced puts cost ~130ms EACH through the tunnel)
        mats = arena_device_put(tuple(mats))

        def build(mats, Binv):
            mats, Binv = unview((mats, Binv))
            M = Binv.astype(dt)
            for A, P, R, wdn, wup in reversed(mats):
                n = A.shape[0]
                eye = jnp.eye(n, dtype=A.dtype)
                X = wdn[:, None] * eye  # zero-guess first sweep
                for _ in range(sweeps - 1):
                    X = X + wdn[:, None] * (eye - A @ X)
                X = X + P @ (M @ (R @ (eye - A @ X)))
                for _ in range(sweeps):
                    X = X + wup[:, None] * (eye - A @ X)
                M = X
            return M

        M = jax.jit(build)(mats, self.levels[-1].coarse_inv)
        n_ls = self._host_A[ls].shape[0]
        dense = DenseMatrix(data=M, num_rows=n_ls, num_cols=n_ls)
        reloc = getattr(self, "_reloc_cells", {})
        if ls in reloc:
            rcell, ncells = reloc[ls]
            rc = arena_fast_put(rcell.astype(np.int32))
            op = ScatterOp(inner=GatherOp(inner=dense, pos=rc), pos=rc,
                           n_out=ncells)
        else:
            op = dense
        self.levels = self.levels[:ls] + [dataclasses.replace(
            self.levels[ls], coarse_inv=op, P=None, R=None,
        )]

    def _plan_reloc(self, cpos0) -> list:
        """Plan the relocation chain (see _build_relocated): per level k,
        the distinct-cell assignment rcell and lattice/factor geometry,
        with all offset-budget gates evaluated — but no DIA data built.
        Returns a list of dicts (possibly empty)."""
        import scipy.sparse as _sp

        from ...ops.dia import (
            embedded_offset_count,
            parity_offset_count_plan,
            relocate_to_cells,
            tail_min_count,
        )

        o = self.opts
        if not o.relocate_level2 or o.lattice_shape is None or cpos0 is None:
            return []
        shape = tuple(int(s) for s in o.lattice_shape)
        if len(shape) == 2:
            shape = (*shape, 1)
        if len(shape) != 3:
            return []
        L = len(self._host_A)
        n0 = self._host_A[0].shape[0]
        if int(np.prod(shape)) != n0:
            return []
        if L < 4:
            return []
        # small level-2 ops are already dense-MXU (freeze_auto) — faster
        # than any lattice form
        if self._host_A[2].shape[0] <= o.relocate_min_n2:
            return []
        if (_updown_relax_types(o) - {0, 7, 18}
                or o.grid_relax_points is not None):
            return []

        mdt = np.dtype(o.mat_dtype or o.dtype)

        def pick_factors(lat_shape, npts):
            # NEVER split the x axis unless forced: x is the minor (lane)
            # dimension on TPU and a stride-2 slice there is a
            # catastrophic XLA relayout (measured 10.8 ms at 96^3 vs
            # 71 us for the y/z-only split).  Among the y/z candidates,
            # pick the FITTING one with the FEWEST cells: lattice load
            # factor is a direct multiplier on every relocated
            # operator's stored width (first-fit left level 2 at 26%
            # load — a silent 2x on the V-cycle's dominant HBM term).
            best = None
            for fx in (1, 2):
                for fy in (1, 2, 4):
                    for fz in (1, 2, 4):
                        if fx * fy * fz == 1:
                            continue
                        if any(s % f for s, f in zip(lat_shape, (fx, fy, fz))):
                            continue
                        nc = (
                            (lat_shape[0] // fx)
                            * (lat_shape[1] // fy)
                            * (lat_shape[2] // fz)
                        )
                        if npts > 0.85 * nc:
                            continue
                        if best is None or (fx, nc) < (best[0][0], best[1]):
                            best = ((fx, fy, fz), nc)
            return best[0] if best else None

        # state: level k-1 lives on `lat_shape` with its points at
        # `pos_prev` (fine level-1 points sit at their true positions)
        plan = []
        lat_shape = shape
        pos_prev = cpos0
        itemsize = mdt.itemsize
        for k in range(2, L - 1):
            n_k = self._host_A[k].shape[0]
            if n_k <= 64:
                break
            pos_k = pos_prev[self._cf[k - 1] > 0]
            factors = pick_factors(lat_shape, n_k)
            if factors is None:
                break
            cell_shape = tuple(s // f for s, f in zip(lat_shape, factors))
            ncells = int(np.prod(cell_shape))
            rcell = relocate_to_cells(pos_k, lat_shape, factors)
            if rcell is None:
                break
            A_k = self._host_A[k]
            tmin = tail_min_count(ncells, itemsize) if o.relocate_tail else 0
            if n_k > 6144:
                cnt = embedded_offset_count(A_k, rcell, rcell, tail_min=tmin)
                if o.relocate_offset_budget > 0:
                    cnt = min(cnt, o.relocate_offset_budget)
                if cnt > o.max_relocated_offsets or (
                    cnt * ncells * itemsize > o.relocate_max_bytes
                ):
                    break
            # parity transfer budget, counted without building the data
            Pk1 = self._host_P[k - 1].tocoo()
            ncells_prev = int(np.prod(lat_shape))
            Pf = _sp.csr_matrix(
                (Pk1.data, (pos_prev[Pk1.row], Pk1.col)),
                shape=(ncells_prev, n_k),
            )
            pr_offs = max(
                parity_offset_count_plan(
                    Pf, rcell, lat_shape, factors, False, tail_min=tmin
                ),
                parity_offset_count_plan(
                    Pf.T.tocsr(), rcell, lat_shape, factors, True,
                    tail_min=tmin,
                ),
            )
            if o.transfer_offset_budget > 0:
                # budget + per-row rescue entries (bounded by the rescue
                # rows' distinct offsets; small in practice).  OFF by
                # default — see the option comment (convergence hazard).
                pr_offs = min(pr_offs, 2 * o.transfer_offset_budget)
            if pr_offs > o.max_relocated_offsets or (
                pr_offs * ncells * itemsize > o.relocate_max_bytes
            ):
                break
            plan.append(dict(
                k=k, rcell=rcell, lat_shape=lat_shape, factors=factors,
                cell_shape=cell_shape, ncells=ncells, Pf=Pf, tail_min=tmin,
            ))
            lat_shape = cell_shape
            pos_prev = rcell
        return plan

    def _build_relocated(self, cpos0, plan: list) -> None:
        """Relocate coarse levels onto per-level compact lattices (see
        BoomerAMGOptions.relocate_level2).  Recursively, level k's points
        (an irregular algebraic subset of level k-1's) are assigned
        DISTINCT cells of level k-1's lattice coarsened by per-axis
        factors — a pure permutation, so AMG convergence is unchanged.
        The payoff chain:
          * A_k becomes a DIA operator on its compact lattice (Pallas
            streaming) while n_k is large, or a dense-MXU op wrapped in
            small gather/scatter while n_k <= dense threshold;
          * P_{k-1}/R_{k-1} become parity-factored DIA sums (pure
            reshape splits — never an x/lane split, which is a
            catastrophic XLA relayout);
          * no XLA HBM gather survives anywhere above the dense tail.
        The chain stops where _plan_reloc stopped (tiny levels / offset
        budgets); the level below a stop keeps compressed forms behind
        one small gather/scatter."""
        from ...ops.dia import (
            DenseMatrix,
            GatherOp,
            ScatterOp,
            build_embedded_dia,
            build_parity_interp,
            build_parity_restrict,
        )

        o = self.opts
        dt = np.dtype(o.dtype)
        mdt = np.dtype(o.mat_dtype or o.dtype)
        relocated_ks = {ent["k"] for ent in plan}
        self._reloc_cells = {
            ent["k"]: (ent["rcell"], ent["ncells"]) for ent in plan
        }
        for ent in plan:
            k = ent["k"]
            rcell = ent["rcell"]
            lat_shape = ent["lat_shape"]
            factors = ent["factors"]
            ncells = ent["ncells"]
            Pf = ent["Pf"]
            A_k = self._host_A[k]
            n_k = A_k.shape[0]

            # --- the relocated A_k ----------------------------------------
            if n_k > 6144:
                if o.relocate_offset_budget > 0:
                    from .rap import offset_budget_filter

                    A_k = offset_budget_filter(
                        A_k, rcell, o.relocate_offset_budget,
                        lump=o.relocate_lump,
                    )
                A_new = build_embedded_dia(
                    A_k, rcell, rcell, ncells, mdt, device=False,
                    tail_min=ent.get("tail_min", 0), defer=True,
                )
            else:
                # dense-MXU core behind tiny gather/scatter
                rcell_i32 = rcell.astype(np.int32)
                dense = DenseMatrix(
                    data=A_k.toarray().astype(mdt), num_rows=n_k, num_cols=n_k
                )
                A_new = ScatterOp(
                    inner=GatherOp(inner=dense, pos=rcell_i32),
                    pos=rcell_i32,
                    n_out=ncells,
                )

            # --- parity transfer ops between lattice k-1 and k ------------
            if o.transfer_offset_budget > 0:
                from ...ops.dia import parity_offset_budget_filter

                Pf = parity_offset_budget_filter(
                    Pf, rcell, lat_shape, factors, o.transfer_offset_budget
                )
            Pop = build_parity_interp(
                Pf, rcell, lat_shape, factors, mdt, device=False,
                tail_min=ent.get("tail_min", 0), defer=True,
            )
            Rop = build_parity_restrict(
                Pf.T.tocsr(), rcell, lat_shape, factors, mdt, device=False,
                tail_min=ent.get("tail_min", 0), defer=True,
            )

            # --- commit level k --------------------------------------------
            diag = A_k.diagonal()
            dinv_e = np.zeros(ncells, dtype=dt)
            dinv_e[rcell] = np.where(diag == 0, 0.0, 1.0 / np.where(diag == 0, 1, diag))
            l1 = self._l1_norms(A_k)
            l1inv_e = np.zeros(ncells, dtype=dt)
            l1inv_e[rcell] = np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1, l1))
            cmask_e = np.zeros(ncells, dtype=bool)
            cmask_e[rcell[self._cf[k] > 0]] = True

            lvl_k = self.levels[k]
            new_P = lvl_k.P
            new_R = lvl_k.R
            if k + 1 in relocated_ks:
                # the next chain step overwrites levels[k].P/R with parity
                # mats — leave the (never-frozen) compact forms out
                new_P = new_R = None
            elif k < len(self._host_P):
                innerP, innerR = lvl_k.P, lvl_k.R
                if innerP is None:  # was skipped in the freeze loop
                    Pk = self._host_P[k]
                    Rk = self._host_R[k]
                    if Rk is None:
                        Rk = Pk.T.tocsr()
                    innerP = freeze_auto(
                        CSRMatrix.from_scipy(Pk), dtype=mdt, device=False
                    )
                    innerR = freeze_auto(
                        CSRMatrix.from_scipy(Rk), dtype=mdt, device=False
                    )
                rcell_i32 = rcell.astype(np.int32)
                new_P = ScatterOp(inner=innerP, pos=rcell_i32, n_out=ncells)
                new_R = GatherOp(inner=innerR, pos=rcell_i32)
            self.levels[k - 1] = dataclasses.replace(
                self.levels[k - 1], P=Pop, R=Rop
            )
            self.levels[k] = dataclasses.replace(
                lvl_k,
                A=A_new,
                dinv=dinv_e,
                l1inv=l1inv_e,
                cmask=cmask_e,
                P=new_P,
                R=new_R,
            )

    # ------------------------------------------------------------------
    # stats (par_stats.c)
    # ------------------------------------------------------------------
    @property
    def num_levels(self) -> int:
        # logical setup hierarchy depth (par_stats.c "Number of levels");
        # the frozen execution hierarchy can be shorter when the coarse
        # sub-cycle is collapsed (see _build_coarse_collapse)
        return len(self._host_A)

    @property
    def num_frozen_levels(self) -> int:
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
    def _relax_plan(self, cycle_param: int):
        """(relax_type, per-sweep points) for this cycle position —
        par_cycle.c:288/333 grid_relax_type[cycle_param] and
        grid_relax_points[cycle_param][j]; the modern scalar options
        (relax_down/up/coarse + num_sweeps_*) fill in when the
        old-style arrays are unset.  points: 0 = all, 1 = C, -1 = F."""
        o = self.opts
        if o.grid_relax_type is not None:
            rt = int(o.grid_relax_type[cycle_param])
        elif cycle_param == 3:
            rt = o.relax_coarse
        else:
            rt = o.relax_down if cycle_param in (0, 1) else o.relax_up
        if o.grid_relax_points is not None:
            return rt, tuple(int(p) for p in o.grid_relax_points[cycle_param])
        if cycle_param == 3:
            ns = (o.num_sweeps_coarse or o.num_sweeps) if rt != 9 else 1
        else:
            ns = (o.num_sweeps_down if cycle_param in (0, 1)
                  else o.num_sweeps_up) or o.num_sweeps
        return rt, (0,) * ns

    def _smooth(self, lvl: AMGLevel, relax_type: int, u, f, up: bool,
                u_zero: bool = False, points: int = 0,
                level: int | None = None):
        """u_zero: caller guarantees u == 0 — the first down-smooth of
        every level inside a preconditioner cycle.  Jacobi-family sweeps
        then skip the A @ 0 matvec (bitwise-identical result; ~one
        matvec saved per level per cycle — the single biggest V-cycle
        HBM cost after the smoothers themselves)."""
        o = self.opts
        w = self._level_weight(level)
        lvl = unview(lvl)
        if relax_type == 9:
            ci = lvl.coarse_inv
            if ci is None and self._seq_coarse is not None:
                # seq_threshold coarse solve: ONE nested V-cycle
                # (gen_redcs_mat.c hypre_seqAMGCycle, MaxIter 1)
                return self._seq_coarse.cycle(f)
            if isinstance(ci, (ScatterOp, GatherOp, DenseMatrix)):
                return spmv(ci, f)  # collapsed sub-cycle operator
            return ci @ f
        if lvl.euclid is not None:
            # aux smoother replaces relaxation (par_cycle.c
            # smooth_num_levels branch; smooth_type 9 = Euclid)
            from .euclid import euclid_smooth

            return euclid_smooth(
                lvl.euclid, lambda v: spmv(lvl.A, v), u, f, w
            )
        if lvl.schwarz is not None:
            from .schwarz import schwarz_smooth

            return schwarz_smooth(lvl.schwarz, lambda v: spmv(lvl.A, v), u, f, w)
        if lvl.parasails is not None:
            from .parasails import parasails_smooth

            return parasails_smooth(
                lvl.parasails, lambda v: spmv(lvl.A, v), u, f, w)
        if relax_type in (0, 5, 7, 18):
            # 0/7 weighted Jacobi; 5 chaotic GS (order-free on a data-
            # parallel machine == Jacobi, par_relax.c's own caveat);
            # 18 l1-Jacobi
            div = lvl.l1inv if relax_type == 18 else lvl.dinv
            if points and lvl.cmask is not None:
                # old-style grid_relax_points sweep (par_relax.c
                # relax_points argument: update only C (+1) or F (-1))
                mask = lvl.cmask if points == 1 else ~lvl.cmask
                if u_zero:
                    return jnp.where(mask, w * div * f, 0.0)
                return jacobi_cf(lvl.A, div, u, f, mask, w)
            if o.relax_order == 1:
                first = True
                order = (~lvl.cmask, lvl.cmask) if up else (lvl.cmask, ~lvl.cmask)
                for mask in order:
                    if u_zero and first:
                        u = jnp.where(mask, w * div * f, 0.0)
                    else:
                        u = jacobi_cf(lvl.A, div, u, f, mask, w)
                    first = False
                return u
            if u_zero:
                return w * div * f
            return jacobi(lvl.A, div, u, f, w)
        if relax_type in (1, 2, 3, 13):
            # sequential/hybrid forward GS (np=1: true GS; 13 = L1-GS
            # whose option-4 divisor degenerates to |diag|).  omega
            # applies to the hybrid SOR/L1 members (3/13 — par_relax.c
            # has the prod=(1-w*omega) branch in both, :1277/:4525);
            # the pure-sequential 1/2 branches carry no omega term.
            # gauss_seidel's cancellation form assumes divisor == a_ii,
            # which holds for 3 always and for 13 at np=1 (option-4 l1
            # == |diag| with an empty offd).
            om = (self._level_omega(level) if relax_type in (3, 13)
                  else 1.0)
            return self._gs(lvl.gs_fwd, u, f, w, up, points, omega=om)
        if relax_type in (4, 14):
            om = self._level_omega(level)
            return self._gs(lvl.gs_bwd, u, f, w, up, points, omega=om)
        if relax_type in (6, 8):
            # hybrid SSOR / L1-SSOR (same degenerate divisor at np=1).
            # ONE Vtemp copy per Relax call (par_relax.c:3148): the
            # backward half-sweep's S_pre uses the pre-FORWARD iterate.
            om = self._level_omega(level)
            v0 = u if om != 1.0 else None
            u = self._gs(lvl.gs_fwd, u, f, w, up, points, omega=om, v=v0)
            return self._gs(lvl.gs_bwd, u, f, w, up, points, omega=om, v=v0)
        if relax_type == 16:
            return chebyshev(lvl.A, lvl.cheby, u, f)
        if relax_type == 17:
            # FCF-Jacobi (par_relax_more.c:661): weighted Jacobi on
            # F, then C, then F points
            for mask in (~lvl.cmask, lvl.cmask, ~lvl.cmask):
                u = jacobi_cf(lvl.A, lvl.dinv, u, f, mask, w)
            return u
        if relax_type == 15:
            # CG smoother (par_relax_more.c hypre_ParCSRRelax_CG): a few
            # unpreconditioned CG iterations as the smoothing operator
            r = f - spmv(lvl.A, u)
            p = r
            rr = jnp.vdot(r, r)
            for _ in range(3):
                Ap = spmv(lvl.A, p)
                denom = jnp.vdot(p, Ap)
                alpha = jnp.where(denom != 0, rr / jnp.where(denom == 0, 1, denom), 0.0)
                u = u + alpha * p
                r = r - alpha * Ap
                rr_new = jnp.vdot(r, r)
                beta = jnp.where(rr != 0, rr_new / jnp.where(rr == 0, 1, rr), 0.0)
                p = r + beta * p
                rr = rr_new
            return u
        from ...utils.errors import arg_error

        raise arg_error(f"relax_type {relax_type} not implemented")

    def _level_weight(self, level: int | None) -> float:
        """relax_weight[level] (par_amg.h; SetLevelRelaxWt) with the
        scalar fallback; deeper levels clamp to the last array entry."""
        o = self.opts
        lw = o.level_relax_weights
        if lw is None or level is None or not len(lw):
            return o.relax_weight
        return float(lw[min(level, len(lw) - 1)])

    def _level_omega(self, level: int | None) -> float:
        """omega[level] (par_amg.h; SetLevelOuterWt) with the scalar
        fallback; deeper levels clamp to the last array entry."""
        o = self.opts
        lo = o.level_omegas
        if lo is None or level is None or not len(lo):
            return o.omega
        return float(lo[min(level, len(lo) - 1)])

    def _gs(self, sched, u, f, w, up, points: int = 0, omega: float = 1.0,
            v=None):
        if isinstance(sched, tuple):
            # CF-ordered: down C then F, up F then C (par_cycle.c:398);
            # a grid_relax_points sweep runs just the requested half.
            # Each half-sweep is its own hypre Relax call -> fresh Vtemp
            # (v=None) unless the caller pinned one (SSOR).
            sc, sf = sched
            if points:
                return gauss_seidel(sc if points == 1 else sf, u, f, w,
                                    omega=omega, v=v)
            order = (sf, sc) if up else (sc, sf)
            for sd in order:
                u = gauss_seidel(sd, u, f, w, omega=omega, v=v)
            return u
        if points:
            # Only reachable on a level built without a CF split (the
            # coarsest, or a SolveT tail): every level with cf gets CF
            # schedule pairs whenever point masks are configured.  The
            # reference cannot run this combination either — a nonzero
            # relax_points with a NULL CF_marker dereferences it
            # (par_relax.c:109 CF loop); this gate fails loudly instead.
            raise NotImplementedError(
                "grid_relax_points with GS relaxation on a level with "
                "no CF split (coarsest) — the reference segfaults on "
                "this combination; use 0 (all points) for the coarsest "
                "sweep"
            )
        return gauss_seidel(sched, u, f, w, omega=omega, v=v)

    def cycle(self, f, u=None, levels=None):
        """One V-cycle.  Pass `levels` explicitly inside jits (see note
        above); defaults to this instance's hierarchy."""
        levels = self.levels if levels is None else levels
        u_zero = u is None
        if u is None:
            u = jnp.zeros_like(f)
        o = self.opts
        if max(o.additive, o.mult_additive, o.simple) >= 0:
            return self._additive_cycle(levels, u, f, fine_u_zero=u_zero)
        return self._vcycle(levels, 0, u, f, fine_u_zero=u_zero)

    def _add_dinv(self, lvl):
        """The additive band's smoother scaling (CreateLambda/CreateDinv
        D_data): 1/l1 for add_rlx 18, add_rlx_wt/a_ii for add_rlx 0."""
        o = self.opts
        if o.add_rlx == 0:
            return o.add_rlx_wt * lvl.dinv
        return lvl.l1inv

    def _additive_cycle(self, levels, u, f, fine_u_zero=False):
        """hypre_BoomerAMGAdditiveCycle (par_add_cycle.c:22).  Levels in
        [addlvl, add_end] are additive: the down pass restricts the RAW
        F vector (hypre restricts F_array, not a recomputed residual —
        exact as a preconditioner where u == 0), corrections are applied
        simultaneously and summed through the up pass.  Levels outside
        the band run the multiplicative V steps.  The band smoother is
        Lambda = 2*Dinv - Dinv*A*Dinv (the symmetrized two-sweep Jacobi
        CreateLambda assembles; SPD — safe under PCG), with the ns > 1
        Neumann variant r <- 2r - A*(Lambda r) first; `simple` uses the
        plain x += Dinv*r of CreateDinv."""
        o = self.opts
        levels = unview(list(levels))
        L = len(levels)
        # clamp: a start level past the hierarchy still smooths the
        # coarsest additively (no direct solve exists in this cycle)
        addlvl = min(max(o.additive, o.mult_additive, o.simple), L - 1)
        add_end = L - 1 if o.add_last_lvl < 0 else min(o.add_last_lvl, L - 1)
        ns_down = o.num_sweeps_down or o.num_sweeps
        ns_up = o.num_sweeps_up or o.num_sweeps
        ns_coarse = o.num_sweeps_coarse or o.num_sweeps
        in_band = lambda l: addlvl <= l <= add_end

        U = [None] * L
        F = [None] * L
        U[0], F[0] = u, f
        uz = [False] * L
        uz[0] = fine_u_zero
        # down
        for l in range(L - 1):
            lvl = levels[l]
            if not in_band(l):
                for s in range(ns_down):
                    U[l] = self._smooth(lvl, o.relax_down, U[l], F[l],
                                        up=False, u_zero=uz[l] and s == 0,
                                        level=l)
                uz[l] = False
                r = F[l] - spmv(lvl.A, U[l])
                F[l + 1] = spmv(lvl.R, r)
            else:
                F[l + 1] = spmv(lvl.R, F[l])
            U[l + 1] = jnp.zeros_like(F[l + 1])
            uz[l + 1] = True
        # additive corrections (the Lambda / D_inv apply)
        for l in range(addlvl, min(add_end, L - 1) + 1):
            if l < 0:
                continue
            lvl = levels[l]
            dinv = self._add_dinv(lvl)
            r = F[l]
            if o.simple >= 0:
                c = dinv * r
            else:
                if ns_down > 1:
                    r = 2.0 * r - spmv(
                        lvl.A, dinv * (2.0 * r - spmv(lvl.A, dinv * r)))
                c = dinv * (2.0 * r - spmv(lvl.A, dinv * r))
            U[l] = c if uz[l] else U[l] + c
            uz[l] = False
        # multiplicative coarsest below the band
        if add_end < L - 1:
            lvl = levels[L - 1]
            for s in range(ns_coarse):
                U[L - 1] = self._smooth(lvl, o.relax_coarse, U[L - 1],
                                        F[L - 1], up=False,
                                        u_zero=uz[L - 1] and s == 0,
                                        level=L - 1)
        # up
        for l in range(L - 2, -1, -1):
            U[l] = U[l] + spmv(levels[l].P, U[l + 1])
            coarse = l + 1
            if coarse <= addlvl or coarse > add_end + 1:
                for _ in range(ns_up):
                    U[l] = self._smooth(levels[l], o.relax_up, U[l], F[l],
                                        up=True, level=l)
        return U[0]

    def _vcycle(self, levels, l: int, u, f, top_counter: int | None = None,
                fine_u_zero: bool = False):
        """hypre's nonrecursive cycle state machine (par_cycle.c:255-621),
        traced statically: lev_counter controls V/W revisits, fcycle_lev
        drives the F-cycle.  With cycle_type=1, fcycle=False this is the
        classic V-cycle.  `top_counter` overrides the finest level's
        descent count — used when these levels are the replicated TAIL of
        a distributed hierarchy whose top is a mid-hierarchy level (a
        W-cycle descends cycle_type times there, not once).
        `fine_u_zero`: the incoming u is exactly zero (preconditioner
        application) — first smooths then skip their A @ 0 matvecs
        (bitwise-identical, see _smooth)."""
        assert l == 0
        levels = unview(list(levels))  # lazy arena storage -> arrays
        o = self.opts
        L = len(levels)
        if L == 1:
            return self._smooth(levels[0], o.relax_coarse, u, f, up=False,
                                level=0)

        U: list = [None] * L
        F: list = [None] * L
        U[0], F[0] = u, f
        uz = [False] * L  # "U[level] is exactly zero" tracking
        uz[0] = fine_u_zero
        lev_counter = [top_counter if top_counter is not None else 1] + [
            1 if o.fcycle else o.cycle_type
        ] * (L - 1)
        fcycle_lev = L - 2
        level = 0
        cycle_param = 0
        guard = 0
        while True:
            guard += 1
            if guard > 16384:
                raise RuntimeError("cycle state machine exploded")
            lvl = levels[level]
            rt, pts = self._relax_plan(cycle_param)
            if cycle_param == 3:
                for p in pts:
                    U[level] = self._smooth(
                        lvl, rt, U[level], F[level], up=False, points=p,
                        level=level,
                    )
                uz[level] = False
            else:
                for p in pts:
                    U[level] = self._smooth(
                        lvl, rt, U[level], F[level], up=(cycle_param == 2),
                        u_zero=uz[level], points=p, level=level,
                    )
                    uz[level] = False
            lev_counter[level] -= 1
            if lev_counter[level] >= 0 and level != L - 1:
                r = F[level] - spmv(lvl.A, U[level])
                F[level + 1] = spmv(lvl.R, r)
                U[level + 1] = jnp.zeros_like(F[level + 1])
                uz[level + 1] = True
                level += 1
                lev_counter[level] = max(lev_counter[level], o.cycle_type)
                cycle_param = 1 if level < L - 1 else 3
            elif level != 0:
                U[level - 1] = U[level - 1] + spmv(levels[level - 1].P, U[level])
                level -= 1
                cycle_param = 2
                if o.fcycle and fcycle_lev == level:
                    lev_counter[level] = max(lev_counter[level], 1)
                    fcycle_lev -= 1
            else:
                return U[0]

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
    # transpose solve (par_amg_solve.c hypre_BoomerAMGSolveT)
    # ------------------------------------------------------------------
    @property
    def levels_T(self):
        """Frozen TRANSPOSED hierarchy (lazy): A^T with P/R roles
        swapped, l1 norms recomputed column-wise.  With R = P^T and
        symmetric A this equals the forward hierarchy; it exists for the
        nonsymmetric cases (AIR restriction, convection operators) that
        SolveT serves in the reference."""
        if getattr(self, "_levels_T", None) is None:
            o = self.opts
            dt = np.dtype(o.dtype)
            lvls = []
            L = len(self._host_A)
            for k in range(L):
                AT = self._host_A[k].T.tocsr()
                if k < L - 1:
                    P = self.host_P(k)
                    R = self._host_R[k]
                    if R is None:
                        R = P.T.tocsr()
                    # transpose cycle: interpolate with R^T, restrict P^T
                    PT, RT = R.T.tocsr(), P.T.tocsr()
                    cf = self._cf[k]
                else:
                    PT = RT = cf = None
                lvls.append(self._freeze_level(AT, PT, RT, cf, fine=(k == 0)))
            self._levels_T = list(jax.device_put(tuple(lvls)))
        return self._levels_T

    def cycleT(self, f, u=None):
        """One V-cycle on A^T (the SolveT preconditioner hook)."""
        levels = self.levels_T
        if u is None:
            u = jnp.zeros_like(f)
        return self._vcycle(levels, 0, u, f)

    def solveT(self, b, x0=None, tol: float = 1e-7, max_iter: int = 20,
               min_iter: int = 0) -> SolverResult:
        """Iterate transpose V-cycles until ||b - A^T x|| / ||b|| < tol
        (par_amg_solve.c SolveT)."""
        return self.solve(
            b, x0=x0, tol=tol, max_iter=max_iter, min_iter=min_iter,
            levels=self.levels_T,
        )

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
        # materialize ArenaView storage ONCE, outside the while_loop: a
        # lazy view consumed inside the loop body re-materializes every
        # iteration on remote backends (measured 15x on axon)
        levels = unview(list(levels))
        lvl0 = levels[0]
        n = lvl0.A.num_rows
        x0 = jnp.zeros(n, dtype=lvl0.A.data.dtype) if x0 is None else x0

        A = lvl0.A
        b_norm = jnp.sqrt(jnp.vdot(b, b))
        r0 = b - spmv(A, x0)
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
            r = b - spmv(A, x)
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
