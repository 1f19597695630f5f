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
        # last Set position per group (or -1)
        pos = np.arange(r.size)
        set_pos = np.where(s, pos, -1)
        last_set = np.maximum.accumulate(
            np.where(new_grp, set_pos, np.maximum(set_pos, -1))
        )
        # recompute per-group cummax: reset at group starts
        last_set = np.full(r.size, -1, dtype=np.int64)
        cur = -1
        # vectorized segment cummax via np.maximum.accumulate on keyed values
        key = grp_id.astype(np.int64) * (r.size + 1)
        seeded = np.where(s, key + pos, key - 1)
        run = np.maximum.accumulate(seeded)
        last_set = run - key  # -1 if no set yet in group
        keep = pos >= last_set  # entries at/after last Set (all if none)
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
