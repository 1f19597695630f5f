"""Distributed (sharded) CSR matrix with diag/offd split.

Reference: parcsr_mv/par_csr_matrix.h:27-94 (diag = local columns,
offd = external columns compressed through col_map_offd) and
par_csr_matvec.c:22-315 (pack -> exchange -> diag SpMV overlap -> offd
SpMV into the ghost vector).

TPU design: rows are equal block-partitioned over a 1-D mesh axis; each
shard holds a diag ELL (local col indices) and an offd ELL (ghost-slot
indices), stacked with a leading shard axis and placed with
NamedSharding.  The matvec is a shard_map whose body is:

    ghost = halo.exchange(plan, x_block)      # ppermute per neighbor offset
    y = diag_ell @ x_block + offd_ell @ ghost # fused gathers

GSPMD handles replication of the small plan arrays; psum-based dots work
on the same global arrays, so the Krylov layer is reused unchanged.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.csr import CSRMatrix
from .halo import HaloPlan, build_halo_plan, exchange
from .mesh import AXIS, default_mesh
from .partition import BlockPartition, block_partition
from ..utils.errors import arg_error


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class ParCSR:
    def __init__(
        self,
        A: CSRMatrix,
        mesh: Mesh | None = None,
        axis: str = AXIS,
        max_offsets: int = 8,
        col_part: BlockPartition | None = None,
        dtype=None,
    ):
        """Row-sharded sparse operator.  For rectangular operators (P/R
        transfers in a distributed AMG hierarchy) pass `col_part`, the
        partition of the INPUT vector; the diag block then holds columns
        in the shard's own input block (par_csr_matrix.h diag/offd with
        separate row/col starts).

        This convenience constructor slices a replicated host matrix;
        scalable setup paths (one where no rank ever holds the global
        matrix, par_laplace.c-style local generation) should use
        `ParCSR.from_row_blocks` with locally-generated row blocks.
        """
        mesh = mesh or default_mesh()
        S = mesh.shape[axis]
        part = block_partition(A.num_rows, S)
        M = A.to_scipy().tocsr()
        per = part.rows_per_shard
        blocks = [
            M[min(s * per, A.num_rows): min(s * per + per, A.num_rows)]
            for s in range(S)
        ]
        self._init_from_blocks(
            blocks, (A.num_rows, A.num_cols), mesh, axis, max_offsets,
            col_part, dtype,
        )

    @classmethod
    def from_row_blocks(
        cls,
        blocks,
        shape,
        mesh: Mesh | None = None,
        axis: str = AXIS,
        max_offsets: int = 8,
        col_part: BlockPartition | None = None,
        dtype=None,
    ) -> "ParCSR":
        """Build from per-shard row blocks (scipy CSR, local rows x
        GLOBAL columns) WITHOUT ever materializing the global matrix —
        the scalable-setup entry point (reference: each MPI rank
        assembles only its own rows; par_csr_matrix.h row_starts).
        blocks[s] holds the rows of shard s's block partition."""
        self = cls.__new__(cls)
        self._init_from_blocks(blocks, shape, mesh or default_mesh(),
                               axis, max_offsets, col_part, dtype)
        return self

    def _init_from_blocks(self, blocks, shape, mesh, axis, max_offsets,
                          col_part, dtype=None):
        self.mesh = mesh
        self.axis = axis
        self.n, self.m = int(shape[0]), int(shape[1])
        S = mesh.shape[axis]
        if len(blocks) != S:
            raise arg_error(f"need {S} row blocks, got {len(blocks)}")
        self.part = block_partition(self.n, S)
        self.col_part = col_part or (
            self.part if self.m == self.n else block_partition(self.m, S)
        )
        per = self.part.rows_per_shard
        cper = self.col_part.rows_per_shard

        # per-shard diag/offd split (the par_csr_matrix.h:40-44 layout)
        col_maps = []
        wd = wo = 1
        rows_struct = []
        self.host_blocks = []  # per-shard scipy CSR (local rows x global cols)
        for s in range(S):
            lo = min(s * per, self.n)
            hi = min(lo + per, self.n)
            clo = s * cper
            chi = min(clo + cper, self.m)
            blk = blocks[s].tocsr()
            if dtype is not None:
                blk = blk.astype(dtype)
            if blk.shape[0] != hi - lo:
                raise arg_error(
                    f"shard {s}: expected {hi - lo} rows, got {blk.shape[0]}"
                )
            self.host_blocks.append(blk)
            r = np.repeat(np.arange(hi - lo), np.diff(blk.indptr))
            c = blk.indices
            v = blk.data
            is_diag = (c >= clo) & (c < chi)
            cm = np.unique(c[~is_diag])
            col_maps.append(cm)
            rows_struct.append((r, c, v, is_diag, lo, hi, clo, cm))
            if len(r):
                wd = max(wd, int(np.bincount(r[is_diag], minlength=hi - lo).max(initial=0)))
                if (~is_diag).any():
                    wo = max(wo, int(np.bincount(r[~is_diag], minlength=hi - lo).max(initial=0)))

        self.col_maps = col_maps  # per-shard sorted ghost global col ids
        self.plan: HaloPlan = build_halo_plan(col_maps, self.col_part, max_offsets)
        gw = self.plan.ghost_width

        vdt = (np.dtype(dtype) if dtype is not None
               else np.result_type(*(b.data.dtype for b in blocks)))
        dc = np.zeros((S, per, wd), dtype=np.int32)
        dv = np.zeros((S, per, wd), dtype=vdt)
        oc = np.full((S, per, wo), gw, dtype=np.int32)  # pad -> zero sink slot
        ov = np.zeros((S, per, wo), dtype=vdt)
        # per-row valid-slot counts (host metadata): lets setup plans
        # distinguish ELL pad slots from real entries with value 0
        self.diag_counts = np.zeros((S, per), dtype=np.int32)
        self.offd_counts = np.zeros((S, per), dtype=np.int32)
        for s, (r, c, v, is_diag, lo, hi, clo, cm) in enumerate(rows_struct):
            rd, cd, vd = r[is_diag], c[is_diag] - clo, v[is_diag]
            k = _slot_counter(rd)
            dc[s, rd, k] = cd
            dv[s, rd, k] = vd
            if len(rd):
                self.diag_counts[s] = np.bincount(rd, minlength=per)
            ro, co, vo = r[~is_diag], c[~is_diag], v[~is_diag]
            if len(ro):
                ghost_slot = np.searchsorted(cm, co)
                k = _slot_counter(ro)
                oc[s, ro, k] = ghost_slot
                ov[s, ro, k] = vo
                self.offd_counts[s] = np.bincount(ro, minlength=per)

        shard3 = NamedSharding(self.mesh, P(self.axis, None, None))
        self.diag_cols = jax.device_put(dc, shard3)
        self.diag_data = jax.device_put(dv, shard3)
        self.offd_cols = jax.device_put(oc, shard3)
        self.offd_data = jax.device_put(ov, shard3)
        self.vec_sharding = NamedSharding(self.mesh, P(self.axis))
        self._matvec = self._build_matvec()

    # ------------------------------------------------------------------
    def _build_matvec(self):
        plan, axis, per = self.plan, self.axis, self.part.rows_per_shard

        def body(dc, dv, oc, ov, x):
            x_blk = x.reshape(-1)  # [per]
            dc, dv, oc, ov = (a[0] for a in (dc, dv, oc, ov))
            ghost = exchange(plan, x_blk, axis)
            with jax.named_scope("MATVEC"):
                y = jnp.sum(dv * x_blk[dc], axis=-1)
                y = y + jnp.sum(ov * ghost[oc], axis=-1)
            return y

        mapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                P(self.axis, None, None),
                P(self.axis, None, None),
                P(self.axis, None, None),
                P(self.axis, None, None),
                P(self.axis),
            ),
            out_specs=P(self.axis),
        )

        def matvec(x):
            return mapped(
                self.diag_cols, self.diag_data, self.offd_cols, self.offd_data, x
            )

        return jax.jit(matvec)

    def matvec(self, x: jax.Array) -> jax.Array:
        """x: global padded vector [n_padded], sharded along the axis."""
        return self._matvec(x)

    @property
    def matvec_fn(self):
        return self._matvec

    @property
    def diag_matvec_fn(self):
        """y = A_diagblock @ x (within-shard columns only, no exchange)
        — the hybrid-GS "offd" split: A_offd @ x = matvec(x) - this."""
        if getattr(self, "_diag_matvec", None) is None:
            def body(dc, dv, x):
                dc, dv = dc[0], dv[0]
                x_blk = x.reshape(-1)
                with jax.named_scope("MATVEC"):
                    return jnp.sum(dv * x_blk[dc], axis=-1)

            mapped = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    P(self.axis, None, None),
                    P(self.axis, None, None),
                    P(self.axis),
                ),
                out_specs=P(self.axis),
            )
            self._diag_matvec = jax.jit(
                lambda x: mapped(self.diag_cols, self.diag_data, x)
            )
        return self._diag_matvec

    # ------------------------------------------------------------------
    def pad_vec(self, v) -> jax.Array:
        """Host/global OUTPUT-space vector [n] -> padded sharded array."""
        out = np.zeros(self.part.n_padded, dtype=np.asarray(v).dtype)
        out[: self.n] = np.asarray(v)
        return jax.device_put(out, self.vec_sharding)

    def pad_col_vec(self, v) -> jax.Array:
        """Host/global INPUT-space vector [m] -> padded sharded array."""
        out = np.zeros(self.col_part.n_padded, dtype=np.asarray(v).dtype)
        out[: self.m] = np.asarray(v)
        return jax.device_put(out, self.vec_sharding)

    def unpad(self, y: jax.Array) -> np.ndarray:
        return np.asarray(y)[: self.n]


def _slot_counter(rows: np.ndarray) -> np.ndarray:
    """k-th occurrence index of each row id (rows sorted ascending)."""
    if len(rows) == 0:
        return rows
    first = np.empty(len(rows), dtype=bool)
    first[0] = True
    first[1:] = rows[1:] != rows[:-1]
    pos = np.arange(len(rows))
    start = np.maximum.accumulate(np.where(first, pos, 0))
    return pos - start
