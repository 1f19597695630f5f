"""Sparse matrix containers: host CSR + device ELL.

Reference analog: seq_mv/csr_matrix.{c,h} (hypre_CSRMatrix, csr_matrix.h:25-56).

Design: the shape-dynamic CSR lives on the HOST (numpy), where all setup
(coarsening, interpolation, RAP) runs.  Before the solve phase each matrix
is "frozen" into a static-shape, padded ELL layout on device — the TPU
analog of the VE fork caching an sblas handle on the CSR
(csr_matvec.c:346-352): a one-time layout conversion paid at setup so the
solve-phase SpMV is a fixed, compiler-friendly kernel.

ELL layout: rows padded to `row_pad` granularity, columns padded to the max
row nnz (rounded to `width_pad`).  Padding entries point at column 0 with
value 0, so no masking is needed in the kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def _fast_put(x):
    # deferred import: transfer imports csr (cycle)
    from .transfer import fast_device_put
    return fast_device_put(x)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class CSRMatrix:
    """Host-side CSR (numpy), the setup-phase workhorse."""

    __slots__ = ("indptr", "indices", "data", "shape")

    def __init__(self, indptr, indices, data, shape):
        # preserve scipy's int32 index currency (no nnz-sized upcast
        # copies at wrap time); anything else is normalized to int64
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        if indptr.dtype != np.int32:
            indptr = indptr.astype(np.int64, copy=False)
        if indices.dtype != np.int32:
            indices = indices.astype(np.int64, copy=False)
        self.indptr = indptr
        self.indices = indices
        self.data = np.asarray(data)
        self.shape = (int(shape[0]), int(shape[1]))

    # -- constructors -------------------------------------------------
    @classmethod
    def from_scipy(cls, m) -> "CSRMatrix":
        m = m.tocsr()
        return cls(m.indptr, m.indices, m.data, m.shape)

    @classmethod
    def from_coo(cls, rows, cols, vals, shape) -> "CSRMatrix":
        m = sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()
        m.sum_duplicates()
        return cls.from_scipy(m)

    def to_scipy(self) -> sp.csr_matrix:
        return sp.csr_matrix(
            (self.data, self.indices, self.indptr), shape=self.shape
        )

    # -- properties ---------------------------------------------------
    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @property
    def num_rows(self) -> int:
        return self.shape[0]

    @property
    def num_cols(self) -> int:
        return self.shape[1]

    def row_nnz(self) -> np.ndarray:
        return np.diff(self.indptr)

    def diagonal(self) -> np.ndarray:
        return self.to_scipy().diagonal()

    # -- freeze to device layout --------------------------------------
    def to_ell(
        self,
        row_pad: int = 8,
        width_pad: int = 1,
        dtype=None,
        min_width: int = 1,
        device: bool = True,
        transposed: bool = True,
    ) -> "ELLMatrix":
        n, m = self.shape
        rn = self.row_nnz()
        width = max(int(rn.max(initial=0)), min_width)
        width = _round_up(width, width_pad)
        n_pad = _round_up(max(n, 1), row_pad)

        cols = np.zeros((n_pad, width), dtype=np.int32)
        # convert the nnz-sized data ONCE, scatter into the target-dtype
        # buffer directly (converting the padded [n_pad, width] buffer
        # afterwards re-streams width/mean_nnz x the bytes)
        data = self.data if dtype is None else self.data.astype(
            dtype, copy=False)
        vals = np.zeros((n_pad, width), dtype=data.dtype)
        # scatter each row's entries into its padded slot (vectorized)
        if self.nnz:
            r = np.repeat(np.arange(n), rn)
            k = np.arange(self.nnz) - np.repeat(self.indptr[:-1], rn)
            cols[r, k] = self.indices
            vals[r, k] = data
        if transposed:
            # [width, n_pad] storage: TPU-friendly tiling (see
            # ELLMatrix docstring); also applied to host leaves that
            # later ship to device through the transfer arenas
            cols = np.ascontiguousarray(cols.T)
            vals = np.ascontiguousarray(vals.T)
        return ELLMatrix(
            cols=_fast_put(cols) if device else cols,
            data=_fast_put(vals) if device else vals,
            num_rows=n,
            num_cols=m,
            nnz=self.nnz,
            transposed=bool(transposed),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLMatrix:
    """Device-side padded ELL — the static-shape solve-phase format.

    `transposed` stores cols/data as [width, n_pad] instead of
    [n_pad, width].  On TPU the minor dimension tiles to 128 lanes, so
    a row-major [N, 4] index array is padded 32x in HBM — and worse,
    XLA's slice/reshape reassociation can materialize a whole shipped
    arena at that layout (observed: s32[34232322,4] T(8,128) = 17.5 GB
    for a 547 MB arena, OOMing the 256^3 solve compile).  [width, N]
    puts the large dimension minor: the same data tiles benignly, and
    the SpMV gather/reduce is unchanged math (identical per-row
    reduction order).  Device instances default to transposed; host
    (numpy) instances keep row-major for row-indexed consumers."""

    cols: jax.Array  # int32 [n_pad, width]  ([width, n_pad] transposed)
    data: jax.Array  # real, same shape as cols
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    transposed: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    @property
    def shape(self):
        return (self.num_rows, self.num_cols)

    @property
    def width(self) -> int:
        return self.data.shape[0] if self.transposed else self.data.shape[1]
