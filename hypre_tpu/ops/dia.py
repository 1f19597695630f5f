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
from .transfer import fast_device_put, unview
from .spmv import ell_spmv

# eager Pallas import: jax.experimental.pallas costs ~1.1s on first
# import, and a lazy import lands inside the first csr_to_dia call —
# i.e. inside measured AMG setup time rather than module import
try:  # pragma: no cover - exercised on every platform with pallas
    from . import pallas_dia as _pallas_dia  # noqa: F401
except Exception:  # exotic backends without pallas
    _pallas_dia = None


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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class COOTail:
    """Exact low-frequency remainder of a lattice operator.

    Relocated DIA forms pay ncells * itemsize of streamed bytes PER
    stored diagonal regardless of how many entries live on it; deep AMG
    levels have long tails of diagonals carrying a handful of entries
    each (the desired-diff floor of the relocation).  Entries on those
    rare diagonals are stored here as sorted COO and applied as
    gather + segment-sum + unique-scatter (~5 ns/entry measured on
    v5e) -- the operator stays EXACT, unlike non-Galerkin dropping; only
    the evaluation is split by diagonal frequency (cusparse-HYB's
    ELL+COO split, re-cut for lattice DIA).
    """

    rows_u: jax.Array  # int32 [nseg]  distinct output rows, sorted
    seg: jax.Array     # int32 [T]     entry -> index into rows_u
    cols: jax.Array    # int32 [T]
    vals: jax.Array    # [T]

    @property
    def nnz(self):
        return self.vals.shape[0]


def tail_apply(tail: COOTail, x: jax.Array, y: jax.Array) -> jax.Array:
    contrib = tail.vals.astype(x.dtype) * x[tail.cols]
    per_row = jax.ops.segment_sum(
        contrib, tail.seg, num_segments=tail.rows_u.shape[0]
    )
    return y.at[tail.rows_u].add(per_row, unique_indices=True)


def _build_tail(rows, cols, vals, dtype, device=True) -> COOTail:
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    rows_u, seg = np.unique(rows, return_inverse=True)
    arr = (jnp.asarray if device else np.asarray)
    return COOTail(
        rows_u=arr(rows_u.astype(np.int32)),
        seg=arr(seg.astype(np.int32)),
        cols=arr(cols.astype(np.int32)),
        vals=arr(vals.astype(dtype)),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DIAWithTail:
    """Hybrid lattice operator: streamed DIA majority + exact COOTail."""

    dia: DIAMatrix
    tail: COOTail

    @property
    def num_rows(self):
        return self.dia.num_rows

    @property
    def num_cols(self):
        return self.dia.num_cols

    @property
    def shape(self):
        return self.dia.shape


def tail_min_count(ncells: int, itemsize: int) -> int:
    """Keep a diagonal in DIA only if it carries at least this many
    entries.  One stored diagonal costs its streamed bytes
    (ncells*itemsize / ~573 GB/s) PLUS ~0.19 us of amortized kernel
    dispatch (the offset-chunked Pallas kernel runs ~12 us of fixed cost
    per 64-offset chunk — dominant for small-ncells deep levels); a tail
    entry costs ~5.2 ns (both measured, scripts/exp_tail_apply.py and
    the level-3 row of scripts/profile_cycle_levels.py).  Break-even:
    count >= ncells*itemsize*3.36e-4 + 37."""
    return max(2, int(ncells * itemsize * 3.36e-4) + 37)


def _dia_width(n: int, m: int, offsets, itemsize: int = 4) -> int:
    """Stored diagonal width: pad square matrices to the Pallas kernel's
    block grid at freeze time so no per-matvec padding is needed."""
    if n == m and len(offsets):
        from .pallas_dia import padded_width

        span = int(offsets[-1]) - int(offsets[0])
        return padded_width(n, len(offsets), span, itemsize)
    return n


def _uniq_offsets(offs: np.ndarray, n: int, m: int):
    """(sorted distinct offsets, inverse) for diagonal offsets bounded in
    [-(n-1), m-1].  np.unique SORTS all nnz (seconds at 256^3); a
    presence bitmap + searchsorted against the few distinct diagonals is
    one linear pass."""
    if offs.size == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    present = np.zeros(n + m - 1, dtype=bool)
    present[offs + (n - 1)] = True
    uniq = np.flatnonzero(present) - (n - 1)
    return uniq, np.searchsorted(uniq, offs)


def csr_offsets(indptr, indices, n: int, m: int) -> np.ndarray:
    """Distinct diagonal offsets of a CSR pattern — native one-pass scan
    (no nnz-sized row-expansion temporaries); numpy fallback."""
    from .. import native

    uniq = native.dia_offsets_only(indptr, indices, n, m)
    if uniq is None:
        rows = np.repeat(np.arange(n), np.diff(indptr))
        uniq = _uniq_offsets(np.asarray(indices) - rows, n, m)[0]
    return uniq


def csr_to_dia(A: CSRMatrix, dtype=None, device: bool = True) -> DIAMatrix | None:
    """device=False leaves `data` as numpy for callers that batch the
    whole hierarchy into one jax.device_put (setup-time transfer RTTs
    through remote-device tunnels otherwise dominate)."""
    n, m = A.shape
    dt = np.dtype(dtype or A.data.dtype)
    from .. import native

    conv = native.dia_convert(
        A.indptr, A.indices, A.data, n, m,
        lambda u: _dia_width(n, m, u, dt.itemsize), dt,
    )
    if conv is not None:
        uniq, data = conv
    else:
        rows = np.repeat(np.arange(n), A.row_nnz())
        offs = A.indices - rows
        uniq, k = _uniq_offsets(offs, n, m)
        data = np.zeros(
            (len(uniq), _dia_width(n, m, uniq, dt.itemsize)), dtype=dt
        )
        data[k, rows] = A.data.astype(data.dtype)
    return DIAMatrix(
        data=fast_device_put(data) if device else data,
        offsets=tuple(int(o) for o in uniq),
        num_rows=n,
        num_cols=m,
    )


def device_lattice_dia(shape, coeffs=(1.0, 1.0, 1.0), dtype=np.float32):
    """ZERO-TRANSFER DIA table for the 3D 7-pt lattice Laplacian,
    synthesized on device from iota masks (the values of test/ij.c
    -laplacian via par_laplace.c GenerateLaplacian) — bit-identical to
    csr_to_dia(laplacian_7pt(shape, coeffs)) (tests/test_device_setup.py
    pins this).  The graded device-setup path uses it so the fine
    operator costs no host->device bytes at all: through a degraded
    tunnel the table ship was measured at 500+ s for 25 MB at 96^3 and
    would be ~470 MB at 256^3.  Returns None when the stencil is not
    the full 7-pt one (caller falls back to the ship path)."""
    nx, ny, nz = (int(s) for s in shape)
    cx, cy, cz = (float(c) for c in coeffs)
    if min(nx, ny, nz) < 2 or not (cx and cy and cz):
        return None
    n = nx * ny * nz
    dt = np.dtype(dtype)
    diag = 2.0 * (cx + cy + cz)
    offs = (-nx * ny, -nx, -1, 0, 1, nx, nx * ny)
    W = _dia_width(n, n, offs, dt.itemsize)

    @jax.jit
    def build():
        idx = jax.lax.iota(jnp.int32, W)
        ix = idx % nx
        iy = (idx // nx) % ny
        iz = idx // (nx * ny)
        in_n = idx < n
        coord = {"x": (ix, nx), "y": (iy, ny), "z": (iz, nz)}
        rows = []
        for off, c, ax in ((-nx * ny, cz, "z"), (-nx, cy, "y"),
                           (-1, cx, "x"), (0, diag, None),
                           (1, cx, "x"), (nx, cy, "y"),
                           (nx * ny, cz, "z")):
            if ax is None:
                rows.append(jnp.where(in_n, dt.type(diag), dt.type(0)))
                continue
            u, lim = coord[ax]
            s = 1 if off > 0 else -1
            ok = (u + s >= 0) & (u + s < lim)
            rows.append(jnp.where(in_n & ok, dt.type(-c), dt.type(0)))
        return jnp.stack(rows)

    return DIAMatrix(data=build(), offsets=offs, num_rows=n, num_cols=n)


def dia_spmv(A: DIAMatrix, x: jax.Array) -> jax.Array:
    """y_i = sum_k data[k,i] * x[i + off_k]; shifts instead of gathers.

    Dispatches to the Pallas windowed-DMA kernel on TPU (f32, square,
    large) — ~89% of HBM roofline vs ~16% for the XLA shift path; see
    ops/pallas_dia.py.
    """
    from .pallas_dia import pallas_dia_ok, pallas_dia_spmv

    n, m = A.shape
    with jax.named_scope("MATVEC"):
        if not A.offsets:  # all entries live in a sibling COOTail
            return jnp.zeros(n, x.dtype)
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
    device: bool = True,
):
    """Pick the fastest device format for this matrix."""
    n, m = A.shape
    if n <= dense_max_rows and m <= dense_max_rows:
        dense = A.to_scipy().toarray().astype(dtype or A.data.dtype)
        return DenseMatrix(
            data=fast_device_put(dense) if device else dense,
            num_rows=n,
            num_cols=m,
        )
    if n == m and A.nnz:
        from .. import native

        uniq = native.dia_offsets_only(A.indptr, A.indices, n, m)
        if uniq is None:
            rows = np.repeat(np.arange(n), A.row_nnz())
            uniq = _uniq_offsets(A.indices - rows, n, m)[0]
        if len(uniq) <= dia_max_offsets:
            return csr_to_dia(A, dtype, device=device)
    return A.to_ell(dtype=dtype, device=device)


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
    M, rpos: np.ndarray, cpos: np.ndarray, n_emb: int, dtype=None,
    device: bool = True, tail_min: int = 0, defer: bool = False,
) -> DIAMatrix:
    """Lift a compressed sparse operator onto a lattice embedding.

    M: scipy CSR with rows indexed by `rpos` lattice positions and cols
    by `cpos` positions.  Returns a DIA operator over the n_emb lattice:
    out[rpos[r]] = sum_c M[r,c] * x[cpos[c]], rows off rpos stay zero.
    This is the gather-free form of AMG coarse-level ops for matrices
    whose unknowns live on a sub-lattice (offsets = cpos[c]-rpos[r] are
    few) — trading padded bandwidth for the TPU's slow HBM gathers.
    """
    from .. import native

    Mc = M.tocoo()
    rows_emb = rpos[Mc.row]
    cols_emb = cpos[Mc.col]
    offs = cols_emb - rows_emb
    vals = Mc.data
    dt = np.dtype(dtype or Mc.data.dtype)
    tail = None
    if tail_min:
        cc = native.coo_dia_counts(rows_emb, cols_emb, n_emb)
        if cc is not None:
            uniq0, cnt = cc
            # inverse via O(nnz) lut gather (no per-entry searchsorted)
            lut = np.zeros(2 * n_emb - 1, dtype=np.int64)
            lut[uniq0 + (n_emb - 1)] = np.arange(len(uniq0))
            k0 = lut[offs + (n_emb - 1)]
        else:
            uniq0, k0 = _uniq_offsets(offs, n_emb, n_emb)
            cnt = np.bincount(k0, minlength=len(uniq0))
        low = cnt < tail_min
        if low.any() and not low.all():
            in_tail = low[k0]
            tail = _build_tail(
                rows_emb[in_tail], cols_emb[in_tail], vals[in_tail], dt,
                device=device,
            )
            rows_emb, cols_emb, offs, vals = (
                rows_emb[~in_tail], cols_emb[~in_tail], offs[~in_tail],
                vals[~in_tail],
            )
    if defer and not device:
        # compact (idx, val) description + one device scatter at ship
        # time: never memset/fill the padded image on the host.  Value
        # rounding matches the native fill (f64 -> f32 -> RNE-to-bf16).
        cc = native.coo_dia_counts(rows_emb, cols_emb, n_emb)
        if cc is not None:
            uniq, _ = cc
            lut = np.zeros(2 * n_emb - 1, dtype=np.int64)
            lut[uniq + (n_emb - 1)] = np.arange(len(uniq))
            k = lut[offs + (n_emb - 1)]
        else:
            uniq, k = _uniq_offsets(offs, n_emb, n_emb)
        width = _dia_width(n_emb, n_emb, uniq, dt.itemsize)
        if len(uniq) * width < np.iinfo(np.int32).max:
            from .transfer import DeferredScatter

            v = vals.astype(np.float32) if dt.itemsize < 4 else vals
            dia = DIAMatrix(
                data=DeferredScatter.build(
                    (k * width + rows_emb).astype(np.int64),
                    v.astype(dt),
                    (len(uniq), width),
                ),
                offsets=tuple(int(o) for o in uniq),
                num_rows=n_emb,
                num_cols=n_emb,
            )
            return DIAWithTail(dia=dia, tail=tail) if tail is not None else dia
    conv = native.coo_dia_convert(
        rows_emb, cols_emb, vals, n_emb,
        lambda u: _dia_width(n_emb, n_emb, u, dt.itemsize), dt,
    )
    if conv is not None:
        uniq, data = conv
    else:
        uniq, k = _uniq_offsets(offs, n_emb, n_emb)
        data = np.zeros(
            (len(uniq), _dia_width(n_emb, n_emb, uniq, dt.itemsize)), dtype=dt
        )
        data[k, rows_emb] = vals.astype(dt)
    dia = DIAMatrix(
        data=fast_device_put(data) if device else data,
        offsets=tuple(int(o) for o in uniq),
        num_rows=n_emb,
        num_cols=n_emb,
    )
    return DIAWithTail(dia=dia, tail=tail) if tail is not None else dia


def _embedded_counts(M, rpos, cpos):
    """(uniq embedded offsets, per-offset counts); native when possible
    (no nnz-sized temporaries — the relocation planner calls this per
    candidate lattice factor)."""
    from .. import native

    Mc = M.tocoo()
    if Mc.nnz == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    n = max(int(rpos.max()), int(cpos.max())) + 1
    res = native.embedded_counts(Mc.row, Mc.col, rpos, cpos, n)
    if res is not None:
        return res
    offs = cpos[Mc.col] - rpos[Mc.row]
    uniq, inv = np.unique(offs, return_inverse=True)
    return uniq.astype(np.int64), np.bincount(inv)


def embedded_offsets(M, rpos, cpos) -> np.ndarray:
    """Sorted distinct lattice offsets of the embedded form of M."""
    return _embedded_counts(M, rpos, cpos)[0]


def embedded_offset_count(M, rpos, cpos, tail_min: int = 0) -> int:
    """Distinct embedded offsets; with tail_min, only those KEPT by a
    tailed build (carrying >= tail_min entries)."""
    uniq, cnt = _embedded_counts(M, rpos, cpos)
    if not tail_min:
        return len(uniq)
    if len(uniq) == 0:
        return 0
    kept = int((cnt >= tail_min).sum())
    return kept if kept else len(cnt)


# ---------------------------------------------------------------------------
# Parity-factored (octant) lattice transfer operators
#
# When an AMG coarse level is RELOCATED onto a regular sub-lattice (each
# coarse point assigned a distinct cell of the 2x-coarsened lattice —
# see solvers/amg/boomeramg.py), the restriction R: fine -> cells and
# interpolation P: cells -> fine become strided stencil operators.  A
# strided stencil is a sum over fine-parity classes of SQUARE DIA
# operators on the cell lattice: splitting x by octant (x3[pz::2,
# py::2, px::2], a pure XLA relayout — zero gathers) makes every tap a
# plain diagonal shift.  This turns the gather/scatter transfer ops
# (XLA HBM gather ~130M elem/s) into Pallas-DIA streaming ops.
# ---------------------------------------------------------------------------

def _parity_index(px, py, pz, factors):
    fx, fy, fz = factors
    return (pz * fy + py) * fx + px


def parity_split(x: jax.Array, fine_shape, factors) -> list[jax.Array]:
    """Split a flat fine-lattice vector (x-fastest: gid = ix + nx*(iy +
    ny*iz)) into its parity sub-lattice vectors, cell-lattice flat."""
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    x3 = x.reshape(nz, ny, nx)
    parts = []
    for pz in range(fz):
        for py in range(fy):
            for px in range(fx):
                parts.append(x3[pz::fz, py::fy, px::fx].reshape(-1))
    return parts


def parity_merge(parts, fine_shape, factors) -> jax.Array:
    """Inverse of parity_split: recombine per-parity cell vectors into a
    flat fine-lattice vector (pure reshape/transpose — no scatter)."""
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    cz, cy, cx = nz // fz, ny // fy, nx // fx
    y = jnp.stack(parts).reshape(fz, fy, fx, cz, cy, cx)
    y = jnp.transpose(y, (3, 0, 4, 1, 5, 2))  # -> (cz,pz,cy,py,cx,px)
    return y.reshape(nz * ny * nx)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParityRestrictOp:
    """R: fine lattice -> cell lattice; y = sum_p mats[p] @ split_p(x)."""

    mats: tuple  # 2^k DIAMatrix, square on the cell lattice
    fine_shape: tuple = dataclasses.field(metadata=dict(static=True))
    factors: tuple = dataclasses.field(metadata=dict(static=True))
    # exact rare-diagonal remainder: rows = cells, cols = FLAT fine
    tail: COOTail | None = None

    @property
    def num_rows(self):
        return self.mats[0].num_rows

    @property
    def num_cols(self):
        nx, ny, nz = self.fine_shape
        return nx * ny * nz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParityInterpOp:
    """P: cell lattice -> fine lattice; y = merge_p(mats[p] @ x)."""

    mats: tuple  # 2^k DIAMatrix, square on the cell lattice
    fine_shape: tuple = dataclasses.field(metadata=dict(static=True))
    factors: tuple = dataclasses.field(metadata=dict(static=True))
    # exact rare-diagonal remainder: rows = FLAT fine, cols = cells
    tail: COOTail | None = None

    @property
    def num_rows(self):
        nx, ny, nz = self.fine_shape
        return nx * ny * nz

    @property
    def num_cols(self):
        return self.mats[0].num_cols


def _cells_of_fine(idx, fine_shape, factors):
    """Fine flat index -> (cell flat index, parity index)."""
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    ix = idx % nx
    iy = (idx // nx) % ny
    iz = idx // (nx * ny)
    cx, px = ix // fx, ix % fx
    cy, py = iy // fy, iy % fy
    cz, pz = iz // fz, iz % fz
    cells = cx + (nx // fx) * (cy + (ny // fy) * cz)
    return cells, _parity_index(px, py, pz, factors)


def dia_from_coo(rows, cols, vals, n, m, dtype=None, device=True,
                 defer=False) -> DIAMatrix:
    """DIA directly from UNIQUE (row, col) coordinate entries — skips the
    scipy CSR roundtrip (sort + dedup) the setup path doesn't need.
    defer=True: data is a DeferredScatter (materialized by one device
    scatter at ship time — never memset/filled on the host)."""
    offs = cols - rows
    uniq, k = _uniq_offsets(offs, n, m)
    dt = np.dtype(dtype or vals.dtype)
    width = _dia_width(n, m, uniq, dt.itemsize)
    if defer and not device and len(uniq) * width < np.iinfo(np.int32).max:
        from .transfer import DeferredScatter

        data = DeferredScatter.build(
            (k * width + rows).astype(np.int64),
            vals.astype(dt),
            (len(uniq), width),
        )
    else:
        data = np.zeros((len(uniq), width), dtype=dt)
        data[k, rows] = vals.astype(dt)
        if device:
            data = fast_device_put(data)
    return DIAMatrix(
        data=data,
        offsets=tuple(int(o) for o in uniq),
        num_rows=n,
        num_cols=m,
    )


def _per_parity_dia(rows_cell, cols_cell, parity, vals, ncells, nparity, dtype,
                    device=True, defer=False):
    # fine index <-> (cell, parity) is a bijection, so entries within one
    # parity class are unique (row, col) pairs — no dedup needed
    mats = []
    for p in range(nparity):
        m = parity == p
        mats.append(dia_from_coo(
            rows_cell[m], cols_cell[m], vals[m], ncells, ncells, dtype,
            device=device, defer=defer,
        ))
    return tuple(mats)


def _parity_tail_mask(rows_cell, cols_cell, parity, ncells, tail_min):
    """Entries on (parity, offset) diagonals with < tail_min entries."""
    key = parity.astype(np.int64) * (2 * ncells + 1) + (
        cols_cell - rows_cell + ncells
    )
    ukey, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv)
    low = cnt[inv] < tail_min
    return low if low.any() and not low.all() else None


def build_parity_restrict(M, rcell, fine_shape, factors, dtype=None, device=True,
                          tail_min: int = 0, defer: bool = False):
    """M: scipy sparse (n_pts x n_fine) with rows = coarse points, cols =
    fine lattice indices; rcell[i] = assigned cell of point i."""
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    ncells = (nx // fx) * (ny // fy) * (nz // fz)
    Mc = M.tocoo()
    ccell, par = _cells_of_fine(Mc.col.astype(np.int64), fine_shape, factors)
    rows_cell, vals = rcell[Mc.row], Mc.data
    cols_fine = Mc.col.astype(np.int64)
    dt = np.dtype(dtype or Mc.data.dtype)
    tail = None
    if tail_min:
        low = _parity_tail_mask(rows_cell, ccell, par, ncells, tail_min)
        if low is not None:
            tail = _build_tail(
                rows_cell[low], cols_fine[low], vals[low], dt, device=device
            )
            rows_cell, ccell, par, vals = (
                rows_cell[~low], ccell[~low], par[~low], vals[~low]
            )
    mats = _per_parity_dia(
        rows_cell, ccell, par, vals, ncells, fx * fy * fz, dt, device=device,
        defer=defer,
    )
    return ParityRestrictOp(mats=mats, fine_shape=tuple(fine_shape),
                            factors=tuple(factors), tail=tail)


def build_parity_interp(M, ccol, fine_shape, factors, dtype=None, device=True,
                        tail_min: int = 0, defer: bool = False):
    """M: scipy sparse (n_fine x n_pts) with rows = fine lattice indices,
    cols = coarse points; ccol[j] = assigned cell of point j."""
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    ncells = (nx // fx) * (ny // fy) * (nz // fz)
    Mc = M.tocoo()
    rcell, par = _cells_of_fine(Mc.row.astype(np.int64), fine_shape, factors)
    cols_cell, vals = ccol[Mc.col], Mc.data
    rows_fine = Mc.row.astype(np.int64)
    dt = np.dtype(dtype or Mc.data.dtype)
    tail = None
    if tail_min:
        low = _parity_tail_mask(rcell, cols_cell, par, ncells, tail_min)
        if low is not None:
            tail = _build_tail(
                rows_fine[low], cols_cell[low], vals[low], dt, device=device
            )
            rcell, cols_cell, par, vals = (
                rcell[~low], cols_cell[~low], par[~low], vals[~low]
            )
    mats = _per_parity_dia(
        rcell, cols_cell, par, vals, ncells, fx * fy * fz, dt, device=device,
        defer=defer,
    )
    return ParityInterpOp(mats=mats, fine_shape=tuple(fine_shape),
                          factors=tuple(factors), tail=tail)


def parity_offset_count(ops) -> int:
    return sum(len(m.offsets) for m in ops.mats)


def parity_offset_count_plan(
    M, point_cell, fine_shape, factors, restrict: bool, tail_min: int = 0
) -> int:
    """Total DIA offsets a parity restrict/interp build would produce,
    WITHOUT building it (setup planning).  restrict=True: M rows are
    points (cells via point_cell), cols are fine lattice indices;
    restrict=False: the transpose convention (build_parity_interp)."""
    Mc = M.tocoo()
    if Mc.nnz == 0:
        return 0
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    ncells = (nx // fx) * (ny // fy) * (nz // fz)
    if restrict:
        ccell, par = _cells_of_fine(Mc.col.astype(np.int64), fine_shape, factors)
        r, c = point_cell[Mc.row], ccell
    else:
        rcell, par = _cells_of_fine(Mc.row.astype(np.int64), fine_shape, factors)
        r, c = rcell, point_cell[Mc.col]
    key = par.astype(np.int64) * (2 * ncells + 1) + (c - r + ncells)
    if tail_min:
        _, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv)
        kept = int((cnt >= tail_min).sum())
        return kept if kept else len(cnt)  # all-tail degenerates to keep
    return len(np.unique(key))


def parity_offset_budget_filter(
    M, point_cell, fine_shape, factors, budget: int
):
    """Truncate a transfer operator to its `budget` heaviest parity
    diagonals (total across parity classes).

    M: scipy sparse in the build_parity_interp convention — rows = fine
    lattice indices, cols = points (point_cell[j] = assigned cell).  The
    parity-factored DIA form's storage is sum_p noffs_p x ncells; deep
    levels' relocation displacement scatters the offsets (observed 300+
    total at 96^3), dwarfing the true nnz.  Keeps entries on the budget
    (parity, offset) diagonals with the most |value| mass; rows that
    would lose every entry keep their single largest one (their offsets
    ride along); kept rows are RESCALED to preserve row sums — hypre's
    interpolation-truncation semantics (par_interp.c
    hypre_BoomerAMGInterpTruncation).  Build R from the filtered M's
    transpose so R = P^T stays exact.
    """
    import scipy.sparse as _sp

    Mc = M.tocoo()
    if Mc.nnz == 0:
        return M
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    ncells = (nx // fx) * (ny // fy) * (nz // fz)
    rcell, par = _cells_of_fine(Mc.row.astype(np.int64), fine_shape, factors)
    c = np.asarray(point_cell, dtype=np.int64)[Mc.col]
    key = par.astype(np.int64) * (2 * ncells + 1) + (c - rcell + ncells)
    ukey, inv = np.unique(key, return_inverse=True)
    if budget <= 0 or len(ukey) <= budget:
        return M
    absd = np.abs(Mc.data)
    mass = np.bincount(inv, weights=absd)
    order = np.argsort(-mass, kind="stable")[:budget]
    kept_key = np.zeros(len(ukey), dtype=bool)
    kept_key[order] = True
    keep = kept_key[inv]
    # rows that would empty keep their largest-|value| entry
    n_rows = M.shape[0]
    row_best = np.full(n_rows, -1, dtype=np.int64)
    o = np.argsort(absd, kind="stable")  # ascending: later wins = max
    row_best[Mc.row[o]] = o
    row_has_kept = np.zeros(n_rows, dtype=bool)
    row_has_kept[Mc.row[keep]] = True
    rescue_rows = np.flatnonzero(~row_has_kept & (row_best >= 0))
    keep[row_best[rescue_rows]] = True
    # row-sum-preserving rescale of kept entries
    s_old = np.bincount(Mc.row, weights=Mc.data, minlength=n_rows)
    s_new = np.bincount(Mc.row[keep], weights=Mc.data[keep], minlength=n_rows)
    safe = np.abs(s_new) > 1e-12 * np.maximum(np.abs(s_old), 1e-300)
    scale = np.where(safe & (s_new != 0), s_old / np.where(s_new == 0, 1, s_new), 1.0)
    out = _sp.csr_matrix(
        (Mc.data[keep] * scale[Mc.row[keep]], (Mc.row[keep], Mc.col[keep])),
        shape=M.shape,
    )
    out.sort_indices()
    return out


def relocate_to_cells(pos, fine_shape, factors, max_load=0.9):
    """Assign each point (fine flat lattice index) a DISTINCT cell of the
    factor-coarsened lattice near its own position (host, deterministic).

    This is the setup step that makes algebraically-chosen (PMIS/...)
    coarse grids lattice-regular again: the assignment is a permutation,
    so the relocated coarse operator is similarity-equivalent (identical
    spectrum, identical AMG convergence) while its diagonals become few.

    Collision resolution is displacement-COHERENT: within each (cy, cz)
    row of cells, x-sorted points receive strictly increasing cx via a
    push-right-then-clamp isotonic pass, so nearby points share nearly
    equal displacements and graph-edge cell differences collapse onto
    few diagonals.  (The previous nearest-free-ring scan displaced
    colliding points incoherently; measured at 96^3 level 2 it stored
    613 diagonals vs 451 for this assignment, with top-128 nnz coverage
    0.89 vs 0.97.)  Row overflow (points in a cell row exceeding cxn)
    is carried to the next row in (z, y) scan order -- rare at
    load <= max_load for PMIS-style quasi-uniform point sets.

    Returns int64 cells or None if npts > max_load * ncells.
    """
    pos = np.asarray(pos, dtype=np.int64)
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    cxn, cyn, czn = nx // fx, ny // fy, nz // fz
    ncells = cxn * cyn * czn
    m = len(pos)
    if m > max_load * ncells:
        return None
    ix = pos % nx
    iy = (pos // nx) % ny
    iz = pos // (nx * ny)
    cx = ix // fx
    row = iy // fy + cyn * (iz // fz)  # (cy, cz) flat row id
    nrows = cyn * czn

    # ---- stage 1: carry row overflow along the (z, y) scan ----------
    order = np.lexsort((pos, ix, row))
    counts = np.bincount(row[order], minlength=nrows)
    if counts.max() > cxn:
        idx_by_row = np.split(order, np.cumsum(counts)[:-1])
        carry: list = []
        for r in range(nrows):
            cur = list(idx_by_row[r]) + carry
            carry = []
            if len(cur) > cxn:
                cur.sort(key=lambda i: ix[i])
                over = len(cur) - cxn
                carry = cur[-over:]
                cur = cur[:cxn]
            for i in cur:
                row[i] = r
        if carry:  # wrapped past the last row: nearest row with space
            counts2 = np.bincount(row[np.setdiff1d(order, carry)],
                                  minlength=nrows)
            desired_row = iy // fy + cyn * (iz // fz)
            for i in carry:
                free = np.flatnonzero(counts2 < cxn)
                r = free[np.argmin(np.abs(free - desired_row[i]))]
                row[i] = r
                counts2[r] += 1
        order = np.lexsort((pos, ix, row))
        counts = np.bincount(row[order], minlength=nrows)

    # ---- stage 2: per-row isotonic x assignment ----------------------
    # push-right (a_i = max(a_{i-1} + 1, cx_i) within the row) via a
    # segmented prefix max of (cx_i - rank_i), then clamp from the right
    # so the row fits: a_i <= cxn - m_row + rank_i.  Both bounds are
    # strictly increasing in rank, so the result is a valid distinct
    # in-range assignment whenever m_row <= cxn.
    d = cx[order]
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    rank = np.arange(m) - np.repeat(starts, counts)
    seg_id = np.repeat(np.arange(nrows), counts)
    BIG = np.int64(1) << 40
    run = np.maximum.accumulate(d - rank + seg_id * BIG)
    a = run - seg_id * BIG + rank
    m_row = np.repeat(counts, counts)
    a = np.minimum(a, cxn - m_row + rank)
    out = np.empty(m, dtype=np.int64)
    out[order] = a + cxn * row[order]
    return out


def spmv(A, x: jax.Array) -> jax.Array:
    """Polymorphic matvec over ELL / DIA / dense / gather / scatter
    (dispatch is static).  ArenaView leaves (lazily-shipped hierarchy
    storage, ops/transfer.py) materialize here: free (fused) under jit,
    one small cached slice program per spec when eager."""
    A = unview(A)
    if isinstance(A, DIAMatrix):
        return dia_spmv(A, x)
    if isinstance(A, DIAWithTail):
        return tail_apply(A.tail, x, dia_spmv(A.dia, x))
    if isinstance(A, DenseMatrix):
        return dense_spmv(A, x)
    if isinstance(A, GatherOp):
        return spmv(A.inner, x[A.pos])
    if isinstance(A, ScatterOp):
        y = spmv(A.inner, x)
        return jnp.zeros(A.n_out, y.dtype).at[A.pos].set(y)
    if isinstance(A, ParityRestrictOp):
        acc = _parity_restrict_batched(A, x)
        if A.tail is not None:  # rows = cells, cols = flat fine
            acc = tail_apply(A.tail, x, acc)
        return acc
    if isinstance(A, ParityInterpOp):
        y = parity_merge(_parity_interp_batched(A, x),
                         A.fine_shape, A.factors)
        if A.tail is not None:  # rows = flat fine, cols = cells
            y = tail_apply(A.tail, x, y)
        return y
    return ell_spmv(A, x)[: A.num_rows]


def _parity_union(mats):
    """(union offsets, per-offset participating (mat-index, row) lists)
    — static trace-time metadata for the batched parity apply."""
    union = sorted({int(o) for m in mats for o in m.offsets})
    plan = []
    for off in union:
        who = []
        for b, m in enumerate(mats):
            try:
                k = m.offsets.index(off)
            except ValueError:
                continue
            who.append((b, k))
        plan.append((off, who))
    return plan


def _shift_cells(x, off):
    """shift a cell-lattice vector: out[i] = x[i + off] (zero fill)."""
    n = x.shape[-1]
    if off == 0:
        return x
    z = jnp.zeros(x.shape[:-1] + (abs(off),), x.dtype)
    if off > 0:
        return jnp.concatenate([x[..., off:], z], axis=-1)
    return jnp.concatenate([z, x[..., :off]], axis=-1)


def _parity_interp_batched(A, x):
    """All 2^k parity mats applied to the SAME cell vector as ONE pass
    over the UNION of their offsets: each shifted x is computed once
    and multiplied into every participating mat's output row.  The
    per-mat loop dispatched 8 x ~30 separate shifted multiplies on
    small arrays (launch-bound — the measured deep-level V-cycle
    floor); this does ~union ops over [B, ncells] blocks."""
    mats = A.mats
    B = len(mats)
    nc = mats[0].num_rows
    Y = jnp.zeros((B, nc), x.dtype)
    for off, who in _parity_union(mats):
        shx = _shift_cells(x[:nc], off)
        rows = jnp.stack([mats[b].data[k][:nc] for b, k in who])
        bids = jnp.asarray([b for b, _ in who])
        Y = Y.at[bids].add(rows.astype(x.dtype) * shx[None, :])
    return [Y[b] for b in range(B)]


def _parity_restrict_batched(A, x):
    """y = sum_b mats[b] @ split_b(x) in one union-offset pass over the
    stacked parity parts [B, ncells] (see _parity_interp_batched)."""
    mats = A.mats
    nc = mats[0].num_rows
    X = jnp.stack(parity_split(x, A.fine_shape, A.factors))  # [B, nc']
    y = jnp.zeros(nc, x.dtype)
    for off, who in _parity_union(mats):
        bids = jnp.asarray([b for b, _ in who])
        shX = _shift_cells(X[bids], off)
        rows = jnp.stack([mats[b].data[k][:nc] for b, k in who])
        y = y + (rows.astype(x.dtype) * shX).sum(axis=0)
    return y
