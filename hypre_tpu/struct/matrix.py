"""Structured stencil matrices and their matvec.

Reference: struct_mv/struct_matrix.{c,h} (per-stencil-entry data arrays)
and struct_matvec.c:92 (stencil-unrolled matvec).

TPU design: a StructMatrix is {offset tuple -> coefficient array of grid
shape}.  The matvec is a sum of shifted elementwise multiplies — XLA
fuses the whole stencil into one VPU kernel over the grid, which is the
BoxLoop analog (boxloop_host.h:92) with the compiler doing the tiling.
Out-of-grid neighbor values are zero (the ghost-initialized-to-zero
semantics of struct vectors), so shifts zero-fill; periodic dims wrap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .grid import StructGrid
from ..utils.errors import arg_error


def shift(x, offset, periodic=None):
    """out[i] = x[i + offset], zero-filled (or wrapped) outside."""
    ndim = x.ndim
    periodic = periodic or (0,) * ndim
    out = x
    for d, o in enumerate(offset):
        if o == 0:
            continue
        if periodic[d]:
            out = jnp.roll(out, -o, axis=d)
            continue
        n = out.shape[d]
        pad = [(0, 0)] * ndim
        if o > 0:
            idx = [slice(None)] * ndim
            idx[d] = slice(o, n)
            pad[d] = (0, o)
        else:
            idx = [slice(None)] * ndim
            idx[d] = slice(0, n + o)
            pad[d] = (-o, 0)
        out = jnp.pad(out[tuple(idx)], pad)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StructMatrix:
    """offsets: static tuple of index-offset tuples; data: [ns, *shape].

    Constant-coefficient entries (struct_matrix.h constant_coefficient /
    HYPRE_StructMatrixSetConstantEntries) are stored as STATIC python
    floats (const_offsets/const_values) — XLA constant-folds them into
    the fused stencil kernel, so a fully-constant stencil matvec costs
    only the x traffic (measured 13x faster than variable-coefficient
    at 96^3).
    """

    data: jax.Array
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    periodic: tuple = dataclasses.field(metadata=dict(static=True), default=None)
    const_offsets: tuple = dataclasses.field(metadata=dict(static=True), default=())
    const_values: tuple = dataclasses.field(metadata=dict(static=True), default=())
    _shape: tuple = dataclasses.field(metadata=dict(static=True), default=None)

    @classmethod
    def from_dict(cls, entries: dict, grid: StructGrid | None = None, dtype=None):
        """Scalar (python float / 0-d) entries become constant-coefficient
        storage; array entries stay variable."""
        var = {o: v for o, v in entries.items() if np.ndim(v) > 0}
        const = {o: float(v) for o, v in entries.items() if np.ndim(v) == 0}
        offsets = tuple(sorted(var.keys()))
        arrs = [np.asarray(var[o], dtype=dtype) for o in offsets]
        if arrs:
            shape = arrs[0].shape
        elif grid is not None:
            shape = tuple(grid.shape)
        else:
            raise arg_error("all-constant StructMatrix needs a grid")
        co = tuple(sorted(const.keys()))
        data = (
            jnp.stack([jnp.asarray(a) for a in arrs])
            if arrs
            else jnp.zeros((0, *shape), dtype=dtype or jnp.float64)
        )
        return cls(
            data=data,
            offsets=offsets,
            periodic=grid.periodic if grid else (0,) * len(shape),
            const_offsets=co,
            const_values=tuple(const[o] for o in co),
            _shape=tuple(shape),
        )

    @property
    def shape(self):
        return self._shape if self._shape is not None else self.data.shape[1:]

    @property
    def grid(self) -> StructGrid:
        return StructGrid(tuple(self.shape), self.periodic)

    @property
    def all_offsets(self):
        return tuple(sorted(set(self.offsets) | set(self.const_offsets)))

    def entry(self, offset):
        offset = tuple(offset)
        if offset in self.const_offsets:
            k = self.const_offsets.index(offset)
            return jnp.full(self.shape, self.const_values[k], self.data.dtype)
        return self.data[self.offsets.index(offset)]

    def diagonal(self):
        return self.entry((0,) * len(self.shape))

    def densify(self) -> "StructMatrix":
        """All-variable form (for setup paths that scan .data directly)."""
        if not self.const_offsets:
            return self
        entries = {o: np.asarray(self.data[k]) for k, o in enumerate(self.offsets)}
        for o, v in zip(self.const_offsets, self.const_values):
            entries[o] = np.full(self.shape, v)
        return StructMatrix.from_dict(entries, self.grid)

    # -- host conversions ------------------------------------------------
    def to_scipy(self) -> sp.csr_matrix:
        """Assemble the equivalent sparse matrix (out-of-grid couplings
        dropped = ghost-zero semantics).  Host-side, for setup/RAP."""
        shape = tuple(self.shape)
        n = int(np.prod(shape))
        grids = np.indices(shape)  # [ndim, *shape]
        row_id = np.ravel_multi_index(grids, shape).ravel()
        rows_l, cols_l, vals_l = [], [], []
        data = np.asarray(self.data)
        all_entries = [(off, data[k]) for k, off in enumerate(self.offsets)]
        all_entries += [
            (off, np.full(shape, v))
            for off, v in zip(self.const_offsets, self.const_values)
        ]
        for off, ent in all_entries:
            tgt = [grids[d] + off[d] for d in range(len(shape))]
            ok = np.ones(shape, dtype=bool)
            for d in range(len(shape)):
                if self.periodic and self.periodic[d]:
                    tgt[d] = tgt[d] % shape[d]
                else:
                    ok &= (tgt[d] >= 0) & (tgt[d] < shape[d])
            col_id = np.ravel_multi_index(
                [np.clip(t, 0, s - 1) for t, s in zip(tgt, shape)], shape
            ).ravel()
            okf = ok.ravel()
            rows_l.append(row_id[okf])
            cols_l.append(col_id[okf])
            vals_l.append(ent.ravel()[okf])
        M = sp.coo_matrix(
            (np.concatenate(vals_l), (np.concatenate(rows_l), np.concatenate(cols_l))),
            shape=(n, n),
        ).tocsr()
        M.sum_duplicates()
        return M

    @classmethod
    def from_scipy(cls, M: sp.csr_matrix, shape: tuple, periodic=None) -> "StructMatrix":
        """Inverse of to_scipy: recover the stencil-form representation."""
        Mc = M.tocoo()
        ri = np.array(np.unravel_index(Mc.row, shape))
        ci = np.array(np.unravel_index(Mc.col, shape))
        off = ci - ri  # [ndim, nnz]
        offs, inv = np.unique(off.T, axis=0, return_inverse=True)
        entries = {}
        for k, o in enumerate(offs):
            a = np.zeros(shape)
            sel = inv == k
            a[tuple(ri[:, sel])] = Mc.data[sel]
            entries[tuple(int(v) for v in o)] = a
        g = StructGrid(tuple(shape), periodic)
        return cls.from_dict(entries, g)


def struct_matvec(A: StructMatrix, x, alpha=1.0, beta=0.0, y=None):
    """y = alpha*A*x + beta*y (struct_matvec.c semantics)."""
    with jax.named_scope("MATVEC"):
        acc = None
        for k, off in enumerate(A.offsets):
            t = A.data[k] * shift(x, off, A.periodic)
            acc = t if acc is None else acc + t
        for off, v in zip(A.const_offsets, A.const_values):
            # static scalar: folded into the fused kernel by XLA
            t = v * shift(x, off, A.periodic)
            acc = t if acc is None else acc + t
        if alpha != 1.0:
            acc = alpha * acc
        if y is not None and beta != 0.0:
            acc = acc + beta * y
        return acc
