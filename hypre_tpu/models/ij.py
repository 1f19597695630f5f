"""IJ assembly interface (reference: IJ_mv/, SURVEY §2.4).

The linear-algebra-view assembly API: create an empty matrix/vector by
global extents, SetValues/AddToValues in any order, Assemble, GetObject.
Mirrors hypre semantics (IJMatrix_parcsr.c): SetValues overwrites any
earlier contribution to an entry; AddToValues accumulates; a Set after
Adds discards them; Adds after a Set accumulate on top of it.

This is a host-side accumulator (the aux_parcsr_matrix.c analog) that
vectorizes assembly with numpy sorts instead of per-row dynamic arrays.
Distribution happens later, when the assembled CSRMatrix is sharded.
"""

from __future__ import annotations

import numpy as np

from ..ops.csr import CSRMatrix


class IJMatrix:
    def __init__(self, nrows: int, ncols: int):
        self.shape = (int(nrows), int(ncols))
        self._rows: list[np.ndarray] = []
        self._cols: list[np.ndarray] = []
        self._vals: list[np.ndarray] = []
        self._isset: list[np.ndarray] = []
        self._assembled: CSRMatrix | None = None

    def _push(self, rows, cols, values, is_set: bool):
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        cols = np.atleast_1d(np.asarray(cols, dtype=np.int64))
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        rows, cols, values = np.broadcast_arrays(rows, cols, values)
        self._rows.append(rows.ravel())
        self._cols.append(cols.ravel())
        self._vals.append(values.ravel())
        self._isset.append(np.full(rows.size, is_set))
        self._assembled = None

    def set_values(self, rows, cols, values):
        self._push(rows, cols, values, True)

    def add_to_values(self, rows, cols, values):
        self._push(rows, cols, values, False)

    def set_row(self, row, cols, values):
        self._push(np.full(len(cols), row), cols, values, True)

    def assemble(self) -> CSRMatrix:
        if self._assembled is not None:
            return self._assembled
        if not self._rows:
            self._assembled = CSRMatrix.from_coo([], [], [], self.shape)
            return self._assembled
        rows = np.concatenate(self._rows)
        cols = np.concatenate(self._cols)
        vals = np.concatenate(self._vals)
        isset = np.concatenate(self._isset)
        seq = np.arange(rows.size)

        # sort by (row, col, seq); per (row,col) group, keep the suffix
        # after the last Set (inclusive of that Set's value).
        order = np.lexsort((seq, cols, rows))
        r, c, v, s = rows[order], cols[order], vals[order], isset[order]
        new_grp = np.empty(r.size, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        grp_id = np.cumsum(new_grp) - 1
        # FINAL last-Set position per group (or -1): entries strictly
        # before it are discarded — a Set overwrites earlier Sets AND
        # earlier Adds (IJMatrix_parcsr.c semantics; a running cummax
        # here would wrongly keep contributions between two Sets)
        pos = np.arange(r.size)
        set_pos = np.where(s, pos, -1)
        starts = np.flatnonzero(new_grp)
        grp_last = np.maximum.reduceat(set_pos, starts)
        keep = pos >= grp_last[grp_id]  # all kept when group has no Set
        self._assembled = CSRMatrix.from_coo(
            r[keep], c[keep], v[keep], self.shape
        )
        return self._assembled

    # hypre naming
    def get_object(self) -> CSRMatrix:
        return self.assemble()


class IJVector:
    def __init__(self, n: int):
        self.n = int(n)
        self._data = np.zeros(self.n)
        self._touched = np.zeros(self.n, dtype=bool)

    def set_values(self, idx, values):
        idx = np.asarray(idx, dtype=np.int64)
        self._data[idx] = values
        self._touched[idx] = True

    def add_to_values(self, idx, values):
        np.add.at(self._data, np.asarray(idx, dtype=np.int64), values)
        self._touched[idx] = True

    def assemble(self) -> np.ndarray:
        return self._data

    get_object = assemble


def ij_assemble_device(rows, cols, values, is_set, shape):
    """Device-side IJ assembly (reference: IJ_mv/IJMatrix_parcsr_device.c
    — device-pointer SetValues/AddToValues resolved with sort + segment
    reductions instead of host per-row accumulators).

    rows/cols/values/is_set: staged entry streams (device or host
    arrays), in arrival order.  Semantics match the host accumulator:
    the LAST Set wins and only Adds arriving after it accumulate on top;
    with no Set, all Adds sum.  Runs as eager jnp ops (one-shot setup
    work).  Entries are keyed by the (row, col) PAIR via a two-key
    lexsort — no row*ncols+col product, so nothing overflows int32 for
    any matrix whose individual dimensions fit the active int dtype.

    Returns (urows, ucols, uvals) device arrays of the assembled unique
    entries, sorted by (row, col) — ready for CSRMatrix.from_coo or a
    direct device freeze.
    """
    import jax
    import jax.numpy as jnp

    idt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    rows = jnp.asarray(rows, idt)
    cols = jnp.asarray(cols, idt)
    values = jnp.asarray(values)
    is_set = jnp.asarray(is_set, bool)
    m = int(rows.shape[0])
    del shape  # dimensions only bound the inputs; keys are pairs
    seq = jnp.arange(m, dtype=idt)

    order = jnp.lexsort((seq, cols, rows))
    row_s, col_s = rows[order], cols[order]
    seq_s, val_s, set_s = seq[order], values[order], is_set[order]

    # segment ids over sorted unique (row, col) pairs
    new_seg = jnp.concatenate([
        jnp.ones(1, bool),
        (row_s[1:] != row_s[:-1]) | (col_s[1:] != col_s[:-1]),
    ])
    seg = jnp.cumsum(new_seg.astype(idt)) - 1
    nseg = int(seg[-1]) + 1 if m else 0

    # last Set per segment (-1 if none)
    set_seq = jnp.where(set_s, seq_s, -1)
    last_set = jax.ops.segment_max(set_seq, seg, num_segments=nseg)
    keep = jnp.where(
        set_s, seq_s == last_set[seg], seq_s > last_set[seg]
    )
    uvals = jax.ops.segment_sum(jnp.where(keep, val_s, 0.0), seg,
                                num_segments=nseg)
    first_idx = jnp.flatnonzero(new_seg, size=nseg)
    return row_s[first_idx], col_s[first_idx], uvals


class IJMatrixDevice(IJMatrix):
    """IJMatrix whose Assemble runs on device (ij_assemble_device)."""

    def assemble(self) -> CSRMatrix:
        if self._assembled is not None:
            return self._assembled
        if not self._rows:
            self._assembled = CSRMatrix.from_coo([], [], [], self.shape)
            return self._assembled
        r = np.concatenate(self._rows)
        c = np.concatenate(self._cols)
        v = np.concatenate(self._vals)
        s = np.concatenate(self._isset)
        ur, uc, uv = ij_assemble_device(r, c, v, s, self.shape)
        self._assembled = CSRMatrix.from_coo(
            np.asarray(ur), np.asarray(uc), np.asarray(uv), self.shape
        )
        return self._assembled


class IJMatrixSharded:
    """Distributed IJ assembly (IJMatrix_parcsr.c:2774
    hypre_IJMatrixAssembleParCSR): each shard accumulates Set/AddTo
    calls — including entries whose rows it does NOT own — and
    Assemble ships the off-shard queues to their owning shards (the
    MPI exchange), resolves set-wins-then-add semantics per owner, and
    builds the row-sharded ParCSR directly from per-shard blocks (no
    global matrix image).

    Determinism note: the reference leaves cross-rank Set ordering to
    MPI arrival order; here contributions resolve in (owner receives
    sources in shard order, each source in call order), which is a
    fixed total order — re-assembly is bitwise reproducible.
    """

    def __init__(self, nrows: int, ncols: int, mesh=None, axis=None):
        from ..parallel.mesh import AXIS, default_mesh
        from ..parallel.partition import block_partition

        self.shape = (int(nrows), int(ncols))
        self.mesh = mesh or default_mesh()
        self.axis = axis or AXIS
        self.S = self.mesh.shape[self.axis]
        self.part = block_partition(nrows, self.S)
        self._bufs = [IJMatrix(nrows, ncols) for _ in range(self.S)]

    def set_values(self, shard: int, rows, cols, values):
        self._bufs[shard].set_values(rows, cols, values)

    def add_to_values(self, shard: int, rows, cols, values):
        self._bufs[shard].add_to_values(rows, cols, values)

    def assemble(self):
        from ..parallel.par_csr import ParCSR

        nrows, ncols = self.shape
        per = self.part.rows_per_shard
        # the exchange: owner o receives every source shard's entries
        # for its rows, in (source shard, call order) order
        owners_bufs = [IJMatrix(nrows, ncols) for _ in range(self.S)]
        for s in range(self.S):
            b = self._bufs[s]
            for rows, cols, vals, isset in zip(
                    b._rows, b._cols, b._vals, b._isset):
                own = self.part.owner(rows)
                for o in np.unique(own):
                    m = own == o
                    owners_bufs[int(o)]._push(
                        rows[m], cols[m], vals[m], bool(isset[0]))
        blocks = []
        for o in range(self.S):
            M = owners_bufs[o].assemble().to_scipy().tocsr()
            lo = min(o * per, nrows)
            hi = min(lo + per, nrows)
            blocks.append(M[lo:hi])
        return ParCSR.from_row_blocks(
            blocks, self.shape, mesh=self.mesh, axis=self.axis)
