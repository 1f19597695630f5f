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


# relax types whose distributed semantics degenerate to a diagonal-
# scaled simultaneous sweep.  hypre's hybrid GS family (3/4/6) is GS
# within a rank + Jacobi across ranks; on a data-parallel machine the
# rank is a lane, so the across-rank behavior (weighted Jacobi) is the
# faithful limit.  l1 variants (8/13/14/18) keep their l1 divisor —
# hypre's own massively-parallel recommendation (par_relax.c).
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

        # distributed smoother support is explicit (ADVICE r2): any
        # relax type outside the diagonal-sweep families would silently
        # degenerate to one Jacobi sweep on sharded levels while the
        # replicated tail ran the real smoother — reject instead,
        # mirroring _plan_embed's gate style.
        unsupported = (
            {amg.opts.relax_down, amg.opts.relax_up}
            - _L1_TYPES - _DIAG_TYPES
        )
        if unsupported:
            raise NotImplementedError(
                f"ParAMG: relax type(s) {sorted(unsupported)} have no "
                "sharded implementation (supported: hybrid/Jacobi "
                f"families {sorted(_DIAG_TYPES)} and l1 variants "
                f"{sorted(_L1_TYPES)})"
            )

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
        return self._vc(0, jnp.zeros_like(f) if u is None else u, f)

    def _smooth_par(self, lvl: _ParLevel, relax_type: int, u, f, up: bool):
        """Distributed smoother dispatch (see _L1_TYPES note above).
        relax_order=1 runs C-then-F down / F-then-C up (par_cycle.c:398)."""
        o = self.amg.opts
        w = jnp.asarray(o.relax_weight, f.dtype)
        div = lvl.l1inv if relax_type in _L1_TYPES else lvl.dinv
        mv = lvl.A.matvec_fn

        def sweep(u, mask=None):
            with jax.named_scope("RELAX"):
                upd = w * div * (f - mv(u))
                if mask is not None:
                    upd = jnp.where(mask, upd, 0)
                return u + upd

        for _ in range(max(1, o.num_sweeps)):
            if o.relax_order == 1:
                order = (~lvl.cmask, lvl.cmask) if up else (lvl.cmask, ~lvl.cmask)
                for m in order:
                    u = sweep(u, m)
            else:
                u = sweep(u)
        return u

    def _vc(self, l, u, f):
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
                self.tail_levels, 0, u[:lvl_n], f_r, top_counter=top
            )
            return jnp.pad(u_r, (0, f.shape[0] - lvl_n))
        lvl = self.par_levels[l]
        mv = lvl.A.matvec_fn
        u = self._smooth_par(lvl, o.relax_down, u, f, up=False)
        # par_cycle.c lev_counter semantics, traced statically: every
        # level below the finest descends cycle_type times, recomputing
        # the residual from the improved u and re-smoothing between
        # visits (coarse guess restarts at zero each visit)
        visits = 1 if l == 0 else max(1, o.cycle_type)
        for v in range(visits):
            r = f - mv(u)
            fc = lvl.R.matvec_fn(r)
            uc = self._vc(l + 1, jnp.zeros_like(fc), fc)
            u = u + lvl.P.matvec_fn(uc)
            u = self._smooth_par(lvl, o.relax_up, u, f, up=True)
        return u

    @property
    def precond(self):
        return lambda r: self.cycle(r)

    @property
    def fine(self) -> ParCSR:
        return self.par_levels[0].A if self.par_levels else None
