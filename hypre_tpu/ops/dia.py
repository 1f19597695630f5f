"""DIA (diagonal) sparse format + dense fallback — TPU fast paths.

Reference analog: the VE fork's insight that SpMV format choice is the
whole ballgame (csr_matvec.c sblas handles).  On TPU, XLA's HBM gather
runs at ~100M elem/s while contiguous shifted reads stream at memory
bandwidth; matrices whose nonzeros live on few distinct diagonals
(stencil operators: every struct level, AMG fine levels from lattices)
should therefore be stored as diagonals and applied with shifts, and
small coarse matrices as dense MXU matmuls.  `freeze_auto` picks per
matrix: DIA if few offsets, dense if small, padded ELL otherwise.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .csr import CSRMatrix, ELLMatrix
from .spmv import ell_spmv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DIAMatrix:
    """data[k, i] = A[i, i + offsets[k]]  (row-aligned diagonals)."""

    data: jax.Array  # [noff, n]
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.num_rows, self.num_cols)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseMatrix:
    data: jax.Array  # [n, m] (zero padded to lane multiples)
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.num_rows, self.num_cols)


def _dia_width(n: int, m: int, offsets) -> int:
    """Stored diagonal width: pad square matrices to the Pallas kernel's
    block grid at freeze time so no per-matvec padding is needed."""
    if n == m and len(offsets):
        from .pallas_dia import padded_width

        span = int(offsets[-1]) - int(offsets[0])
        return padded_width(n, len(offsets), span)
    return n


def csr_to_dia(A: CSRMatrix, dtype=None) -> DIAMatrix | None:
    n, m = A.shape
    rows = np.repeat(np.arange(n), A.row_nnz())
    offs = A.indices - rows
    uniq = np.unique(offs)
    data = np.zeros((len(uniq), _dia_width(n, m, uniq)), dtype=dtype or A.data.dtype)
    k = np.searchsorted(uniq, offs)
    data[k, rows] = A.data.astype(data.dtype)
    return DIAMatrix(
        data=jnp.asarray(data),
        offsets=tuple(int(o) for o in uniq),
        num_rows=n,
        num_cols=m,
    )


def dia_spmv(A: DIAMatrix, x: jax.Array) -> jax.Array:
    """y_i = sum_k data[k,i] * x[i + off_k]; shifts instead of gathers.

    Dispatches to the Pallas windowed-DMA kernel on TPU (f32, square,
    large) — ~89% of HBM roofline vs ~16% for the XLA shift path; see
    ops/pallas_dia.py.
    """
    from .pallas_dia import pallas_dia_ok, pallas_dia_spmv

    n, m = A.shape
    with jax.named_scope("MATVEC"):
        if pallas_dia_ok(A, x):
            return pallas_dia_spmv(A, x)
        # pad x so every shifted read is a static slice
        lo = max(0, -min(A.offsets))
        hi = max(0, max(A.offsets) + n - m)
        xp = jnp.pad(x, (lo, max(hi, max(0, max(A.offsets)))))
        acc = None
        for k, off in enumerate(A.offsets):
            d = A.data[k]
            if d.shape[0] != n:  # width padded for the Pallas grid
                d = jax.lax.slice_in_dim(d, 0, n)
            t = d * jax.lax.dynamic_slice_in_dim(xp, lo + off, n)
            acc = t if acc is None else acc + t
        return acc


def dense_spmv(A: DenseMatrix, x: jax.Array) -> jax.Array:
    with jax.named_scope("MATVEC"):
        return A.data @ x


def freeze_auto(
    A: CSRMatrix,
    dtype=None,
    dia_max_offsets: int = 48,
    # 6144^2 f32 = 151MB, one spmv = ~0.2ms at roofline — still ~10x
    # cheaper than the equivalent XLA HBM gather for typical AMG widths
    dense_max_rows: int = 6144,
):
    """Pick the fastest device format for this matrix."""
    n, m = A.shape
    if n <= dense_max_rows and m <= dense_max_rows:
        return DenseMatrix(
            data=jnp.asarray(A.to_scipy().toarray().astype(dtype or A.data.dtype)),
            num_rows=n,
            num_cols=m,
        )
    if n == m and A.nnz:
        rows = np.repeat(np.arange(n), A.row_nnz())
        noff = len(np.unique(A.indices - rows))
        if noff <= dia_max_offsets:
            return csr_to_dia(A, dtype)
    return A.to_ell(dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GatherOp:
    """Compress-then-apply: y = inner @ x[pos] (embedded -> compressed)."""

    inner: object
    pos: jax.Array  # int32 [k]

    @property
    def num_rows(self):
        return self.inner.num_rows


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatterOp:
    """Apply-then-embed: y = zeros(n_out).at[pos].set(inner @ x)."""

    inner: object
    pos: jax.Array  # int32 [inner.num_rows]
    n_out: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_rows(self):
        return self.n_out


def build_embedded_dia(
    M, rpos: np.ndarray, cpos: np.ndarray, n_emb: int, dtype=None
) -> DIAMatrix:
    """Lift a compressed sparse operator onto a lattice embedding.

    M: scipy CSR with rows indexed by `rpos` lattice positions and cols
    by `cpos` positions.  Returns a DIA operator over the n_emb lattice:
    out[rpos[r]] = sum_c M[r,c] * x[cpos[c]], rows off rpos stay zero.
    This is the gather-free form of AMG coarse-level ops for matrices
    whose unknowns live on a sub-lattice (offsets = cpos[c]-rpos[r] are
    few) — trading padded bandwidth for the TPU's slow HBM gathers.
    """
    Mc = M.tocoo()
    offs = cpos[Mc.col] - rpos[Mc.row]
    uniq = np.unique(offs)
    dt = dtype or Mc.data.dtype
    data = np.zeros((len(uniq), _dia_width(n_emb, n_emb, uniq)), dtype=dt)
    k = np.searchsorted(uniq, offs)
    data[k, rpos[Mc.row]] = Mc.data.astype(dt)
    return DIAMatrix(
        data=jnp.asarray(data),
        offsets=tuple(int(o) for o in uniq),
        num_rows=n_emb,
        num_cols=n_emb,
    )


def embedded_offset_count(M, rpos, cpos) -> int:
    Mc = M.tocoo()
    if Mc.nnz == 0:
        return 0
    return len(np.unique(cpos[Mc.col] - rpos[Mc.row]))


def spmv(A, x: jax.Array) -> jax.Array:
    """Polymorphic matvec over ELL / DIA / dense / gather / scatter
    (dispatch is static)."""
    if isinstance(A, DIAMatrix):
        return dia_spmv(A, x)
    if isinstance(A, DenseMatrix):
        return dense_spmv(A, x)
    if isinstance(A, GatherOp):
        return spmv(A.inner, x[A.pos])
    if isinstance(A, ScatterOp):
        y = spmv(A.inner, x)
        return jnp.zeros(A.n_out, y.dtype).at[A.pos].set(y)
    return ell_spmv(A, x)[: A.num_rows]
