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
from .partition import block_partition


@dataclasses.dataclass
class _ParLevel:
    A: ParCSR
    P: ParCSR | None
    R: ParCSR | None
    l1inv: jax.Array  # sharded, padded by rows
    dinv: jax.Array


class ParAMG:
    """Wrap a (host-setup) BoomerAMG hierarchy for mesh execution.

    Smoothing on sharded levels is l1-Jacobi (hypre's recommended
    massively-parallel smoother); replicated tail levels run whatever
    the base hierarchy was configured with.
    """

    def __init__(
        self,
        amg: BoomerAMG,
        mesh,
        axis: str = AXIS,
        repl_threshold: int = 8192,
        dtype=None,
    ):
        self.amg = amg
        self.mesh = mesh
        self.axis = axis
        self.repl_threshold = repl_threshold
        dt = dtype or np.dtype(amg.opts.dtype)

        self.par_levels: list[_ParLevel] = []
        self.split = 0
        L = amg.num_levels
        for l in range(L):
            n = amg._host_A[l].shape[0]
            if n < repl_threshold or l == L - 1:
                break
            self.split = l + 1
            Al = CSRMatrix.from_scipy(amg._host_A[l])
            Pl = amg._host_P[l]
            Ap = ParCSR(Al, mesh, axis, dtype=dt)
            nc = Pl.shape[1]
            cpart = block_partition(nc, mesh.shape[axis])
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
            diag = amg._host_A[l].diagonal()
            l1 = np.asarray(np.abs(amg._host_A[l]).sum(axis=1)).ravel()
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
                )
            )

        # replicated tail: refreeze from host data (the base instance may
        # hold lattice-embedded levels whose vector sizes differ)
        tail = []
        for l in range(self.split, L):
            Ah = amg._host_A[l]
            if l < L - 1:
                Ph = amg._host_P[l]
                tail.append(amg._freeze_level(Ah, Ph, Ph.T.tocsr(), amg._cf[l]))
            else:
                tail.append(amg._freeze_level(Ah, None, None, None))
        self.tail_levels = tuple(tail)

    # ------------------------------------------------------------------
    def cycle(self, f, u=None):
        """One V-cycle on mesh-sharded vectors (f padded+sharded)."""
        return self._vc(0, jnp.zeros_like(f) if u is None else u, f)

    def _vc(self, l, u, f):
        if l == self.split:
            # replicated tail: slice to true size, run the base cycle
            lvl_n = self.tail_levels[0].A.num_rows
            f_r = f[:lvl_n]
            u_r = self.amg._vcycle(self.tail_levels, 0, jnp.zeros(lvl_n, f.dtype), f_r)
            return jnp.pad(u_r, (0, f.shape[0] - lvl_n))
        lvl = self.par_levels[l]
        mv = lvl.A.matvec_fn
        # pre-smooth: l1-Jacobi
        u = u + lvl.l1inv * (f - mv(u))
        r = f - mv(u)
        fc = lvl.R.matvec_fn(r)
        uc = self._vc(l + 1, jnp.zeros_like(fc), fc)
        u = u + lvl.P.matvec_fn(uc)
        u = u + lvl.l1inv * (f - mv(u))
        return u

    @property
    def precond(self):
        return lambda r: self.cycle(r)

    @property
    def fine(self) -> ParCSR:
        return self.par_levels[0].A if self.par_levels else None
