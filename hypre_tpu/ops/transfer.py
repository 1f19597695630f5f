"""Arena host->device transfer for frozen hierarchies.

Two measured facts about remote-attached TPU devices shape this module
(all numbers from the 96^3 AMG setup investigation, round 3):

1. Every device_put leaf transfer pays a fixed ~60-75ms round trip on a
   congested link — a frozen AMG hierarchy has ~150 numpy leaves, which
   made 11.5s of transfer for ~25MB of true payload.
2. The frozen lattice forms (relocated DIA diagonal tables, parity
   interp/restrict tables) are mostly explicit zeros: ~410MB of device
   arrays holding ~25MB of nonzeros.

So `arena_device_put` ships a whole pytree as ONE typed 1-D arena per
dtype (a handful of transfer calls total) and rebuilds every leaf with
one jitted unpack program of pure slices/reshapes.  Mostly-zero forms
never exist on the host at all: the freeze-time builders emit compact
`DeferredScatter` (sorted flat index, value) descriptions — the same
compact-aux move the reference makes for device-assembled matrices
(IJ_mv/IJMatrix_parcsr_device.c builds from COO tuples rather than
shipping dense images) — and the unpack program materializes all of
them with one unique+sorted XLA scatter per dtype.

Three XLA:TPU compile-time cliffs dictate the exact shape (each was
measured in isolation): a generic scatter costs ~12-22s to compile vs
~2s with unique_indices + indices_are_sorted (hence builders sort on
the host — a device lax.sort would add ~17s of compile); and byte-level
reshape(n, itemsize) + bitcast from a uint8 arena costs ~3-4s PER LEAF
(hence typed arenas, not one byte blob).  All programs persist in the
repo-local compilation cache.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_MIN_BYTES = 4 << 20  # below this a dense put is cheap enough
_MAX_DENSITY = 0.35  # idx(4B)+val(2B) pairs beat bf16 images under ~1/3


@dataclasses.dataclass(frozen=True)
class DeferredScatter:
    """Compact (flat_index, value) description of a mostly-zero array,
    produced by the freeze-time form builders INSTEAD of materializing
    the zero-padded image on the host.  Materialized into the real
    device array by one scatter at ship time (sparse_device_put) —
    avoids both the host memset+fill and the dense transfer.  Not a
    registered pytree node: jax.tree treats it as a leaf, and it must
    never reach a jit trace (the ship step replaces it)."""

    idx: np.ndarray  # int32 flat indices, SORTED ascending (builders
    # sort at construction: XLA:TPU compiles a unique+sorted scatter in
    # ~5s vs ~22s for the generic one, and a device-side lax.sort costs
    # another ~17s of compile — host-stable-argsort is the cheap spot)
    vals: np.ndarray  # target dtype
    shape: tuple

    @staticmethod
    def build(idx: np.ndarray, vals: np.ndarray, shape: tuple
              ) -> "DeferredScatter":
        """Construct with the sorted-index invariant enforced."""
        order = np.argsort(idx, kind="stable")
        return DeferredScatter(
            idx=np.ascontiguousarray(idx[order], dtype=np.int32),
            vals=np.ascontiguousarray(vals[order]),
            shape=tuple(shape),
        )

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nbytes(self):  # true-content bytes (diagnostics)
        return self.idx.nbytes + self.vals.nbytes

    def to_numpy(self) -> np.ndarray:
        """Host materialization (CPU/test paths that never ship)."""
        out = np.zeros(int(np.prod(self.shape)), dtype=self.vals.dtype)
        out[self.idx] = self.vals
        return out.reshape(self.shape)


def materialize_deferred(d: DeferredScatter) -> jax.Array:
    size = int(np.prod(d.shape))
    b = _bucket(d.idx.size)
    idx = np.full(b, size, dtype=np.int32)
    idx[: d.idx.size] = d.idx
    vals = np.zeros(b, dtype=d.vals.dtype)
    vals[: d.vals.size] = d.vals
    return _scatter(idx, vals, size=size, dtype=d.vals.dtype).reshape(d.shape)


@partial(jax.jit, static_argnames=("size", "dtype"))
def _scatter(idx, vals, *, size, dtype):
    # idx sorted ascending with pad slots == size at the tail (dropped)
    return jnp.zeros(size, dtype).at[idx].set(
        vals, mode="drop", unique_indices=True, indices_are_sorted=True
    )


def _bucket(n: int) -> int:
    return 1 << max(12, int(n - 1).bit_length()) if n else 4096


def _try_sparse(leaf: np.ndarray):
    """Return a device rebuild of `leaf` via compact scatter, or None."""
    flat = leaf.ravel()
    if flat.size >= np.iinfo(np.int32).max:
        return None
    try:
        nz = np.flatnonzero(flat)
    except TypeError:  # dtype without a != ufunc
        return None
    if nz.size > _MAX_DENSITY * flat.size:
        return None
    b = _bucket(nz.size)
    idx = np.full(b, flat.size, dtype=np.int32)
    idx[: nz.size] = nz
    vals = np.zeros(b, dtype=leaf.dtype)
    vals[: nz.size] = flat[nz]
    out = _scatter(idx, vals, size=flat.size, dtype=leaf.dtype)
    return out.reshape(leaf.shape)


def _canon(leaf: np.ndarray) -> np.ndarray:
    """Match jax.device_put's dtype canonicalization (x64 off: f64->f32,
    i64->i32) so arena unpacking is bit-identical to a direct put."""
    import jax.dtypes as jdt

    cdt = jdt.canonicalize_dtype(leaf.dtype)
    return leaf if cdt == leaf.dtype else leaf.astype(cdt)


# Unpacking is LAZY: raw leaves come back as ArenaView pytree nodes —
# a (arena, offset, shape) descriptor whose `.get()` is a slice +
# reshape.  Consumers that run under jit (the solve/cycle programs —
# the only place hierarchy leaves are hot) materialize views inside
# their own trace, where the slice fuses into the consumer for free.
# The eager alternative (round 3) was a jitted 150-slice unpack
# program whose ~6-9MB executable cost 2.5-3.5s PER PROCESS to load
# through the axon deserialize path (and ~122s to compile fused, 2-4s
# per piece split).  The only jitted unpack step left is the per-group
# scatter for DeferredScatter leaves (small executable).


@jax.tree_util.register_pytree_node_class
class ArenaView:
    """Lazy slice+reshape view into a shipped 1-D arena.

    Registered pytree node (child: the arena array; aux: offset/shape/
    isbool) so whole hierarchies of views pass through jit/device_put
    transparently; XLA binds the shared arena buffer to each parameter
    without copying.  `.get()` materializes — free (fused) inside a
    trace, one tiny cached executable per spec when eager."""

    __slots__ = ("arena", "offset", "_shape", "isbool")

    def __init__(self, arena, offset: int, shape: tuple, isbool: bool = False):
        self.arena = arena
        self.offset = int(offset)
        self._shape = tuple(int(s) for s in shape)
        self.isbool = bool(isbool)

    def tree_flatten(self):
        return (self.arena,), (self.offset, self._shape, self.isbool)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def shape(self):
        return self._shape

    @property
    def ndim(self):
        return len(self._shape)

    @property
    def size(self):
        return int(np.prod(self._shape, dtype=np.int64))

    @property
    def dtype(self):
        return np.dtype(np.bool_) if self.isbool else np.dtype(self.arena.dtype)

    @property
    def nbytes(self):  # true content bytes (bench byte models)
        return self.size * self.dtype.itemsize

    def get(self) -> jax.Array:
        numel = int(np.prod(self._shape, dtype=np.int64))
        c = jax.lax.slice(self.arena, (self.offset,), (self.offset + numel,))
        if self.isbool:
            c = c.astype(jnp.bool_)
        return c.reshape(self._shape)

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self.get())
        return a.astype(dtype) if dtype is not None else a

    def __repr__(self):
        return (f"ArenaView(shape={self._shape}, dtype={self.dtype}, "
                f"offset={self.offset})")


def _is_view(x) -> bool:
    return isinstance(x, ArenaView)


def unview(tree):
    """Materialize every ArenaView leaf of a pytree (no-op otherwise)."""
    return jax.tree.map(
        lambda l: l.get() if _is_view(l) else l, tree, is_leaf=_is_view
    )


@jax.tree_util.register_pytree_node_class
class DetachedView:
    """ArenaView with the arena replaced by an INDEX into a separate
    arenas tuple — zero pytree children, so it lives entirely in the
    (static) treedef.

    Why this exists: XLA's HBM accounting charges every program
    parameter separately, so a jit whose argument tree holds ~50
    ArenaViews of one 400MB arena is charged ~20GB of parameter space
    and refuses to compile (observed: 17.78G/15.75G OOM at 96^3).
    detach_arenas() dedupes: each arena crosses the jit boundary ONCE;
    attach_arenas() rebinds views to the traced arenas inside."""

    __slots__ = ("arena_id", "offset", "_shape", "isbool")

    def __init__(self, arena_id: int, offset: int, shape: tuple,
                 isbool: bool = False):
        self.arena_id = int(arena_id)
        self.offset = int(offset)
        self._shape = tuple(int(s) for s in shape)
        self.isbool = bool(isbool)

    def tree_flatten(self):
        return (), (self.arena_id, self.offset, self._shape, self.isbool)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)

    def __repr__(self):
        return (f"DetachedView(arena={self.arena_id}, shape={self._shape}, "
                f"offset={self.offset})")


def _is_detached(x) -> bool:
    return isinstance(x, DetachedView)


def detach_arenas(tree):
    """(arenas, detached_tree): replace every ArenaView leaf by a
    DetachedView indexing into the returned arenas tuple, each unique
    arena buffer appearing exactly once.  Pass `arenas` and
    `detached_tree` as SEPARATE jit arguments and rebind with
    attach_arenas inside the trace."""
    arenas, ids = [], {}

    def f(l):
        if _is_view(l):
            k = id(l.arena)
            if k not in ids:
                ids[k] = len(arenas)
                arenas.append(l.arena)
            return DetachedView(ids[k], l.offset, l._shape, l.isbool)
        return l

    detached = jax.tree.map(f, tree, is_leaf=_is_view)
    return tuple(arenas), detached


def attach_arenas(tree, arenas):
    """Inverse of detach_arenas (valid inside or outside a trace)."""
    def f(l):
        if _is_detached(l):
            return ArenaView(arenas[l.arena_id], l.offset, l._shape,
                             l.isbool)
        return l

    return jax.tree.map(
        f, tree, is_leaf=lambda x: _is_detached(x) or _is_view(x)
    )


@partial(jax.jit, static_argnames=("ioff", "voff", "nnz", "total"))
def _group_scatter(idx_arena, val_arena, *, ioff, voff, nnz, total):
    idx = jax.lax.slice(idx_arena, (ioff,), (ioff + nnz,))
    vals = jax.lax.slice(val_arena, (voff,), (voff + nnz,))
    return jnp.zeros(total, vals.dtype).at[idx].set(
        vals, unique_indices=True, indices_are_sorted=True
    )


def fast_device_put(x: np.ndarray, sync: bool = True) -> jax.Array:
    """device_put for a single large numpy array through a remote-device
    tunnel.  Measured on the axon tunnel (25 MB payload):
    jnp.asarray(2-D) 388 s; jax.device_put(2-D) 0.5-450 s (path-
    dependent); jax.device_put(1-D) + on-device reshape 0.04 s,
    reliably.  Only the flat 1-D put rides the bulk transfer path, so
    ship flat and reshape on device.  `sync=True` forces completion
    with a 1-element readback (block_until_ready returns early through
    the tunnel and a later dependent dispatch would stall behind the
    still-in-flight upload)."""
    x = np.ascontiguousarray(x)
    flat = jax.device_put(x.reshape(-1))
    out = flat.reshape(x.shape) if x.ndim != 1 else flat
    if sync and x.size:  # nothing to sync on an empty leaf
        np.asarray(jax.lax.slice(out.reshape(-1), (0,), (1,)))
    return out


def arena_device_put(tree):
    """device_put a pytree through ONE packed byte buffer + ONE jitted
    unpack call.  Remote-attached devices charge a fixed per-transfer
    round trip (measured 60-75ms per batched_device_put through the
    tunnel — 156 leaf transfers made 11.5s of a 96^3 AMG setup); packing
    every numpy leaf into a single uint8 arena pays that cost once.
    DeferredScatter leaves are materialized inside the same unpack
    program (slice + one XLA scatter), so the zero-padded lattice forms
    never exist on the host and never cross the link.  Already-device
    leaves pass through untouched; results are bitwise identical to
    jax.device_put leaf-by-leaf."""
    leaves, treedef = jax.tree.flatten(tree)
    specs: list = [None] * len(leaves)
    out: list = [None] * len(leaves)
    positions = []
    # typed arenas: dtype name -> [chunk list, elem offset, arena id]
    buckets: dict = {}

    def _append(arr: np.ndarray) -> tuple[int, int]:
        b = buckets.setdefault(arr.dtype.name, [[], 0, len(buckets)])
        start = b[1]
        b[0].append(np.ascontiguousarray(arr).ravel())
        b[1] += arr.size
        return b[2], start

    # group DeferredScatter leaves by dtype; each group becomes ONE
    # concatenated (idx, vals) region + one device scatter.  A group is
    # split when its flat size would overflow the int32 index space.
    gmax = np.iinfo(np.int32).max
    groups: list = []  # [dtype, total, [(leaf_i, deferred, base)]]
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, DeferredScatter):
            dt = np.dtype(jax.dtypes.canonicalize_dtype(leaf.vals.dtype))
            size = int(np.prod(leaf.shape, dtype=np.int64))
            g = next(
                (g for g in groups
                 if g[0] == dt and g[1] + size < gmax),
                None,
            )
            if g is None:
                g = [dt, 0, []]
                groups.append(g)
            g[2].append((i, leaf, g[1]))
            g[1] += size
            positions.append(i)
        elif isinstance(leaf, np.ndarray):
            c = _canon(np.atleast_1d(leaf))
            isbool = c.dtype == np.bool_
            if isbool:
                c = c.astype(np.uint8)
            aid, start = _append(c)
            specs[i] = ("raw", aid, start, tuple(leaf.shape), isbool)
            positions.append(i)
        else:
            out[i] = leaf  # python scalars / already-device leaves
    gspecs = []
    for gid, (dt, total, members) in enumerate(groups):
        idx_all = np.concatenate(
            [m[1].idx.astype(np.int64, copy=False) + m[2] for m in members]
        ).astype(np.int32)
        vals_all = np.concatenate(
            [np.asarray(m[1].vals).astype(dt, copy=False) for m in members]
        )
        aid_i, ioff = _append(idx_all)
        aid_v, voff = _append(vals_all)
        gspecs.append((aid_i, ioff, aid_v, voff, int(idx_all.size), total))
        for i, leaf, base in members:
            specs[i] = ("gslice", gid, base, tuple(leaf.shape))
    if positions:
        from ..utils.timing import timed

        with timed("XFER_PACK"):
            arenas = [None] * len(buckets)
            for _dtn, (chunk_list, _, aid) in buckets.items():
                arenas[aid] = (
                    np.concatenate(chunk_list)
                    if len(chunk_list) > 1
                    else chunk_list[0]
                )
        with timed("XFER_PUT"):
            # one flat put per typed arena, each synced before the next:
            # concurrent large uploads through the tunnel trigger the
            # pathological serialization path (measured 115s for 3x24MB
            # in flight vs 0.5s each sequenced)
            dev_arenas = tuple(fast_device_put(a) for a in arenas)
        raw_pos = [i for i in positions if specs[i][0] == "raw"]
        for i in raw_pos:
            _tag, aid, start, shape, isbool = specs[i]
            out[i] = ArenaView(dev_arenas[aid], start, shape, isbool)
        with timed("XFER_GROUPS"):
            for gid, (aid_i, ioff, aid_v, voff, nnz, total) in enumerate(gspecs):
                flat = _group_scatter(
                    dev_arenas[aid_i], dev_arenas[aid_v],
                    ioff=ioff, voff=voff, nnz=nnz, total=total,
                )
                members = [i for i in positions
                           if specs[i][0] == "gslice" and specs[i][1] == gid]
                for i in members:
                    out[i] = ArenaView(flat, specs[i][2], specs[i][3])
    return jax.tree.unflatten(treedef, out)


def sparse_device_put(tree):
    """device_put a pytree; large mostly-zero numpy leaves ship as
    (idx, val) pairs + one device scatter (bitwise-identical result).
    Remaining leaves ride a single batched jax.device_put."""
    leaves, treedef = jax.tree.flatten(tree)
    out: list = [None] * len(leaves)
    rest_pos, rest = [], []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, DeferredScatter):
            out[i] = materialize_deferred(leaf)
            continue
        if isinstance(leaf, np.ndarray) and leaf.nbytes >= _MIN_BYTES:
            dev = _try_sparse(leaf)
            if dev is not None:
                out[i] = dev
                continue
        rest_pos.append(i)
        rest.append(leaf)
    if rest:
        shipped = jax.device_put(rest)
        for i, dev in zip(rest_pos, shipped):
            out[i] = dev
    return jax.tree.unflatten(treedef, out)
