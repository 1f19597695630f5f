"""Distributed BoomerAMG cycles over a device mesh.

Reference analog: the whole point of parcsr_ls — every AMG phase runs on
row-partitioned matrices with CommPkg exchanges.  TPU design: the finest
levels' A/P/R become row-sharded ParCSR operators (ppermute halo plans);
levels below `repl_threshold` rows are REPLICATED on every device and
reuse the single-device frozen levels — the standard accelerator
pattern: coarse grids are too small to shard profitably, and replicating
them turns the coarse solve into redundant local work (the same idea as
hypre's redundant coarse-grid gather, par_amg_setup.c seq_threshold /
gen_redcs_mat.c, with the mesh playing the sub-communicator).

The math is IDENTICAL to the single-device hierarchy (same host setup),
so iteration counts are partition-invariant by construction — the
.saved cross-np agreement contract (SURVEY §4).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.csr import CSRMatrix
from ..ops.dia import spmv
from ..solvers.amg.boomeramg import BoomerAMG
from .mesh import AXIS
from .par_csr import ParCSR
from .par_dia import ParDIA
from .partition import block_partition


@dataclasses.dataclass
class _ParLevel:
    A: object  # ParCSR | ParDIA
    P: ParCSR | None
    R: ParCSR | None
    l1inv: jax.Array  # sharded, padded by rows
    dinv: jax.Array
    cmask: jax.Array  # sharded bool (CF_marker > 0), for relax_order=1
    gs: dict | None = None  # (forward, l1) -> ParGSSchedule


# Jacobi-family relax types: simultaneous diagonal-scaled sweeps, math
# identical at any shard count.  18 = l1-Jacobi (option-1 norm), 0/7
# weighted Jacobi, 5 chaotic GS (== Jacobi on a data-parallel machine).
_JACOBI_TYPES = frozenset({0, 5, 7})
_L1_JACOBI_TYPES = frozenset({18})
# hybrid GS family: hypre DEFINES these by the process decomposition
# (par_relax.c:1050-1086) — sequential GS inside each rank's diagonal
# block, Jacobi across ranks.  Implemented faithfully per shard
# (parallel/par_gs.py); iteration counts are shard-count-dependent
# exactly as hypre's are rank-count-dependent.  1/2 ("sequential" GS)
# run with hybrid semantics too — hypre's true cross-rank ordering
# would serialize the mesh (documented deviation).
_GS_FWD = frozenset({1, 3, 13})
_GS_BWD = frozenset({2, 4, 14})
_GS_SYM = frozenset({6, 8})
_GS_L1 = frozenset({8, 13, 14})
_GS_TYPES = _GS_FWD | _GS_BWD | _GS_SYM
# legacy aliases (round-2 names, kept for external callers)
_L1_TYPES = frozenset({8, 13, 14, 18})
_DIAG_TYPES = frozenset({0, 1, 2, 3, 4, 5, 6, 7})


class ParAMG:
    """Wrap a (host-setup) BoomerAMG hierarchy for mesh execution.

    Honors the hierarchy's smoother options (relax_down/up, weight,
    sweeps, CF ordering) and cycle_type on the sharded levels (round-1
    hardcoded one l1-Jacobi sweep); replicated tail levels run the full
    base cycle machinery unchanged.  Lattice-stencil levels shard as
    ParDIA (strip-halo streaming — no gathers); general levels as
    ParCSR ELL.
    """

    def __init__(
        self,
        amg: BoomerAMG,
        mesh,
        axis: str = AXIS,
        repl_threshold: int = 8192,
        dtype=None,
        dia_max_offsets: int = 48,
    ):
        self.amg = amg
        self.mesh = mesh
        self.axis = axis
        self.repl_threshold = repl_threshold
        dt = dtype or np.dtype(amg.opts.dtype)
        S = mesh.shape[axis]

        # distributed smoother support is explicit (ADVICE r2): reject
        # anything without a sharded implementation instead of silently
        # degenerating it (round-2 collapsed everything to one Jacobi
        # sweep; GS families are now faithful, par_gs.py).
        rtypes = {amg.opts.relax_down, amg.opts.relax_up}
        unsupported = rtypes - _JACOBI_TYPES - _L1_JACOBI_TYPES - _GS_TYPES
        if unsupported:
            raise NotImplementedError(
                f"ParAMG: relax type(s) {sorted(unsupported)} have no "
                "sharded implementation (supported: Jacobi "
                f"{sorted(_JACOBI_TYPES | _L1_JACOBI_TYPES)} and hybrid "
                f"GS {sorted(_GS_TYPES)})"
            )
        self._gs_cf = amg.opts.relax_order == 1 and bool(rtypes & _GS_TYPES)
        gs_needed = []  # (forward, l1)
        for rt in rtypes & _GS_TYPES:
            l1 = rt in _GS_L1
            if rt in _GS_FWD or rt in _GS_SYM:
                gs_needed.append((True, l1))
            if rt in _GS_BWD or rt in _GS_SYM:
                gs_needed.append((False, l1))

        self.par_levels: list[_ParLevel] = []
        self.split = 0
        L = amg.num_levels
        for l in range(L):
            n = amg._host_A[l].shape[0]
            if n < repl_threshold or l == L - 1:
                break
            self.split = l + 1
            Ah = amg._host_A[l]
            Al = CSRMatrix.from_scipy(Ah)
            Ap = self._shard_operator(Al, mesh, axis, dt, dia_max_offsets, S)
            Pl = amg.host_P(l) if hasattr(amg, "host_P") else amg._host_P[l]
            nc = Pl.shape[1]
            cpart = block_partition(nc, S)
            Pp = ParCSR(
                CSRMatrix.from_scipy(Pl), mesh, axis, col_part=cpart, dtype=dt
            )
            Rp = ParCSR(
                CSRMatrix.from_scipy(Pl.T.tocsr()),
                mesh,
                axis,
                col_part=Ap.part,
                dtype=dt,
            )
            diag = Ah.diagonal()
            l1 = np.asarray(np.abs(Ah).sum(axis=1)).ravel()
            gs = None
            if gs_needed:
                from .par_gs import build_par_gs_schedule

                if self._gs_cf:
                    # relax_order=1: (C, F) half-sweep schedule pairs
                    # per direction (par_cycle.c:398 CF ordering)
                    cm = amg._cf[l] > 0
                    gs = {
                        key: tuple(
                            build_par_gs_schedule(
                                Ah, Ap.part, mesh, axis, forward=key[0],
                                l1=key[1], dtype=dt, mask=m,
                            )
                            for m in (cm, ~cm)
                        )
                        for key in set(gs_needed)
                    }
                else:
                    gs = {
                        key: build_par_gs_schedule(
                            Ah, Ap.part, mesh, axis, forward=key[0],
                            l1=key[1], dtype=dt,
                        )
                        for key in set(gs_needed)
                    }
            self.par_levels.append(
                _ParLevel(
                    A=Ap,
                    P=Pp,
                    R=Rp,
                    l1inv=Ap.pad_vec(
                        np.where(l1 == 0, 0.0, 1.0 / np.where(l1 == 0, 1, l1)).astype(dt)
                    ),
                    dinv=Ap.pad_vec(
                        np.where(diag == 0, 0.0, 1.0 / np.where(diag == 0, 1, diag)).astype(dt)
                    ),
                    cmask=Ap.pad_vec(amg._cf[l] > 0),
                    gs=gs,
                )
            )

        # replicated tail: refreeze from host data (the base instance may
        # hold lattice-embedded levels whose vector sizes differ)
        tail = []
        for l in range(self.split, L):
            Ah = amg._host_A[l]
            if l < L - 1:
                Ph = amg.host_P(l) if hasattr(amg, "host_P") else amg._host_P[l]
                tail.append(amg._freeze_level(Ah, Ph, Ph.T.tocsr(), amg._cf[l]))
            else:
                tail.append(amg._freeze_level(Ah, None, None, None))
        # freeze produces numpy leaves — ship once (jaxpr constants would
        # re-upload per call through remote-device runtimes)
        self.tail_levels = jax.device_put(tuple(tail))

    @staticmethod
    def _shard_operator(Al, mesh, axis, dt, dia_max_offsets, S):
        """ParDIA when the operator is a lattice stencil whose diagonals
        stay within one shard of halo; ParCSR ELL otherwise."""
        from ..ops.dia import csr_to_dia

        n, m = Al.shape
        per = block_partition(n, S).rows_per_shard
        if n == m and Al.nnz:
            rows = np.repeat(np.arange(n), Al.row_nnz())
            offs = np.unique(Al.indices - rows)
            if len(offs) <= dia_max_offsets and (
                int(np.abs(offs).max(initial=0)) <= per
            ):
                D = csr_to_dia(Al, dtype=dt, device=False)
                return ParDIA(D.data, D.offsets, n, mesh, axis)
        return ParCSR(Al, mesh, axis, dtype=dt)

    # ------------------------------------------------------------------
    def cycle(self, f, u=None):
        """One multigrid cycle on mesh-sharded vectors (f padded+sharded),
        honoring the base hierarchy's cycle_type (1 = V, 2 = W)."""
        return self._vc(0, jnp.zeros_like(f) if u is None else u, f,
                        u_zero=u is None)

    def _smooth_par(self, lvl: _ParLevel, relax_type: int, u, f, up: bool,
                    u_zero: bool = False):
        """Distributed smoother dispatch: Jacobi families as
        simultaneous sweeps, hybrid GS (par_relax.c:1050-1086) as
        per-shard sequential GS + Jacobi across shards (par_gs.py).
        relax_order=1 runs C-then-F down / F-then-C up (par_cycle.c:398).
        u_zero: u == 0 — Jacobi sweeps skip the A @ 0 matvec."""
        o = self.amg.opts
        w = jnp.asarray(o.relax_weight, f.dtype)

        if relax_type in _GS_TYPES:
            from .par_gs import par_gauss_seidel

            directions = []
            if relax_type in _GS_FWD or relax_type in _GS_SYM:
                directions.append(True)
            if relax_type in _GS_BWD or relax_type in _GS_SYM:
                directions.append(False)
            l1 = relax_type in _GS_L1
            mv, dmv = lvl.A.matvec_fn, lvl.A.diag_matvec_fn
            for _ in range(max(1, o.num_sweeps)):
                for fwd in directions:
                    sched = lvl.gs[(fwd, l1)]
                    if isinstance(sched, tuple):
                        # relax_order=1: C then F down, F then C up;
                        # each half-sweep refreshes the off-shard
                        # contribution (one exchange per
                        # hypre_BoomerAMGRelax call)
                        sc, sf = sched
                        halves = (sf, sc) if up else (sc, sf)
                    else:
                        halves = (sched,)
                    for h in halves:
                        # offd contribution frozen at sweep start (the
                        # across-rank Jacobi half of the hybrid)
                        g = f - (mv(u) - dmv(u))
                        u = par_gauss_seidel(
                            h, self.mesh, self.axis, u, g, w
                        )
            return u

        div = lvl.l1inv if relax_type in _L1_TYPES else lvl.dinv
        mv = lvl.A.matvec_fn

        def sweep(u, mask=None, u_zero=False):
            with jax.named_scope("RELAX"):
                upd = w * div * (f if u_zero else f - mv(u))
                if mask is not None:
                    upd = jnp.where(mask, upd, 0)
                return upd if u_zero else u + upd

        for s in range(max(1, o.num_sweeps)):
            if o.relax_order == 1:
                order = (~lvl.cmask, lvl.cmask) if up else (lvl.cmask, ~lvl.cmask)
                for mi, m in enumerate(order):
                    u = sweep(u, m, u_zero=u_zero and s == 0 and mi == 0)
            else:
                u = sweep(u, u_zero=u_zero and s == 0)
        return u

    def _vc(self, l, u, f, u_zero=False):
        o = self.amg.opts
        if l == self.split:
            # replicated tail: slice to true size, run the base cycle
            # (full option machinery) with the incoming guess.  The tail
            # top is a MID-hierarchy level when sharded levels sit above
            # it, so a W-cycle descends cycle_type times there.
            lvl_n = self.tail_levels[0].A.num_rows
            f_r = f[:lvl_n]
            top = max(1, o.cycle_type) if self.split > 0 else None
            u_r = self.amg._vcycle(
                self.tail_levels, 0, u[:lvl_n], f_r, top_counter=top,
                fine_u_zero=u_zero,
            )
            return jnp.pad(u_r, (0, f.shape[0] - lvl_n))
        lvl = self.par_levels[l]
        mv = lvl.A.matvec_fn
        u = self._smooth_par(lvl, o.relax_down, u, f, up=False,
                             u_zero=u_zero)
        # par_cycle.c lev_counter semantics, traced statically: every
        # level below the finest descends cycle_type times, recomputing
        # the residual from the improved u and re-smoothing between
        # visits (coarse guess restarts at zero each visit)
        visits = 1 if l == 0 else max(1, o.cycle_type)
        for v in range(visits):
            r = f - mv(u)
            fc = lvl.R.matvec_fn(r)
            uc = self._vc(l + 1, jnp.zeros_like(fc), fc, u_zero=True)
            u = u + lvl.P.matvec_fn(uc)
            u = self._smooth_par(lvl, o.relax_up, u, f, up=True)
        return u

    @property
    def precond(self):
        return lambda r: self.cycle(r)

    @property
    def fine(self) -> ParCSR:
        return self.par_levels[0].A if self.par_levels else None
