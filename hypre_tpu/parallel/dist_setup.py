"""Distributed (sharded) device-resident AMG level-0 setup.

The reference's ENTIRE setup pipeline is MPI-parallel: PMIS exchanges
measures/CF markers through CommPkg halo jobs
(par_coarsen.c:2741 hypre_BoomerAMGCoarsenPMISHost), interpolation
fetches remote rows with hypre_ParCSRMatrixExtractBExt
(par_csr_matop.c:1655), and the Galerkin product is hypre_ParMatmul
(par_csr_matop.c:277) with a scalable CommPkg build
(new_commpkg.c:550).  This module is the TPU-native re-expression for
lattice (DIA) operators: the single-device shift-algebra setup chain
(ops/device_setup.py, solvers/amg/device_coarsen.py) runs unchanged
inside a jax.shard_map over a 1-D mesh, with the `shift` primitive
replaced by a halo-exchange closure — a pair of lax.ppermute edge
transfers (the CommPkg analog) followed by a local slice.  No process
ever holds the global matrix: each shard's diagonal block of the DIA
data is generated (or supplied) locally, exactly like par_laplace.c's
per-rank GenerateLaplacian.

Because the sharded math executes the SAME elementwise/shift operations
in the SAME order as the single-image chain, the CF split, P, and the
coarse operator are bit-identical to the serial device setup (and, in
f64, to the host scipy pipeline) — the .saved contract ("identical
metrics across process counts") holds bitwise, not just statistically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solvers.amg.device_coarsen import lcg_states_host, pmis_impl
from ..ops.device_setup import (
    _symbolic_offsets,
    classical_interp_impl,
    rap_impl,
)
from .mesh import AXIS
from ..utils.errors import arg_error

_PMIS_SEED = 2747


def make_halo_shift(axis: str, n_shards: int, n_local: int):
    """Return shift(x, off, fill) for shard-local 1-D arrays: values
    beyond the local block come from ring neighbors via lax.ppermute
    (non-wraparound, so unsourced edge halos are zero — matching the
    single-image zero fill).  The analog of a struct CommPkg ghost
    exchange (struct_communication.h:18-140) with ghost width |off|."""
    fwd = [(i, i + 1) for i in range(n_shards - 1)]  # data moves up
    bwd = [(i + 1, i) for i in range(n_shards - 1)]  # data moves down

    def shift(x, off, fill=0):
        off = int(off)
        if off == 0:
            return x
        if not (fill == 0 or fill is False):
            raise NotImplementedError("halo shift supports zero fill only")
        w = abs(off)
        if w > n_local:
            raise arg_error(
                f"halo width {w} exceeds shard size {n_local}; "
                f"use fewer shards for this offset set"
            )
        # left halo = last w of the previous shard; right halo = first w
        # of the next shard (zeros at the global edges)
        left = jax.lax.ppermute(
            jax.lax.slice_in_dim(x, n_local - w, n_local), axis, fwd
        )
        right = jax.lax.ppermute(jax.lax.slice_in_dim(x, 0, w), axis, bwd)
        xp = jnp.concatenate([left, x, right])
        return jax.lax.dynamic_slice_in_dim(xp, w + off, n_local)

    return shift


def _global_any(axis):
    return lambda m: jax.lax.psum(jnp.any(m).astype(jnp.int32), axis) > 0


def _global_rowmax(axis):
    return lambda r: jax.lax.pmax(jnp.max(r, axis=1), axis)


def dist_lattice_setup(
    data,
    offsets,
    n: int,
    mesh,
    axis: str = AXIS,
    *,
    seed: int = _PMIS_SEED,
    theta: float = 0.25,
    max_row_sum: float = 0.9,
    trunc_factor: float = 0.0,
    max_elmts: int = 0,
    nongalerkin_tol: float = 0.0,
):
    """Sharded level-0 setup chain: strength -> PMIS -> classical
    interpolation -> Galerkin RAP, all device-resident and sharded over
    `axis`.  `data` is the [noff, n] row-aligned diagonal table of the
    fine operator — pass a jax array already sharded over columns
    (P(None, axis)), e.g. assembled from per-shard local blocks, or a
    numpy array to be sharded here.  Returns
    (cf [n] int8, P_data [noffP, n], offs_P, A1_data [noff1, n],
    offs_1), everything sharded over `axis`; offsets with all-zero P/A1
    rows are dropped exactly as the serial chain drops them.
    """
    offsets = tuple(int(o) for o in offsets)
    S = mesh.shape[axis]
    if n % S:
        raise arg_error(f"n={n} not divisible by {S} shards")
    n_loc = n // S
    shard2 = NamedSharding(mesh, P(None, axis))
    shard1 = NamedSharding(mesh, P(axis))

    if isinstance(data, np.ndarray):
        data = jax.device_put(np.ascontiguousarray(data[:, :n]), shard2)

    # per-shard Park-Miller states by LCG skip-ahead (random.c:81 order:
    # shard s starts at state seed * a^(s*n_loc+1)) — each shard's block
    # computed independently, no O(n) serial walk
    lcg = np.empty(n, dtype=np.int32)
    for s in range(S):
        lcg[s * n_loc: (s + 1) * n_loc] = lcg_states_host(
            seed, n_loc, skip=s * n_loc
        )
    lcg = jax.device_put(lcg, shard1)

    shift = make_halo_shift(axis, S, n_loc)
    any_fn = _global_any(axis)
    rowmax_fn = _global_rowmax(axis)

    @partial(
        jax.jit,
        static_argnames=("offs",),
    )
    def stage1(data, lcg, offs):
        def body(data_blk, lcg_blk):
            cf = pmis_impl(
                data_blk, lcg_blk, offsets=offs, n=n_loc, theta=theta,
                max_row_sum=max_row_sum, shift=shift, any_fn=any_fn,
            )
            P_data, rowmaxP = classical_interp_impl(
                data_blk, cf, offsets=offs, theta=theta,
                max_row_sum=max_row_sum, trunc_factor=trunc_factor,
                max_elmts=max_elmts, shift=shift, rowmax_fn=rowmax_fn,
            )
            return cf, P_data, rowmaxP

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(None, axis), P(axis)),
            out_specs=(P(axis), P(None, axis), P(None)),
        )(data, lcg)

    cf, P_all, rowmaxP = stage1(data, lcg, offsets)
    rmP = np.asarray(rowmaxP)
    keep = [k for k in range(len(offsets)) if rmP[k] > 0]
    offs_P = tuple(offsets[k] for k in keep)
    P_data = P_all[np.asarray(keep, dtype=np.int32)]

    offs_AP = _symbolic_offsets(offsets, offs_P)
    offs_out = _symbolic_offsets(tuple(-o for o in offs_P), offs_AP)

    @partial(jax.jit, static_argnames=("op", "oa", "oap", "oout"))
    def stage2(P_data, data, op, oa, oap, oout):
        def body(P_blk, A_blk):
            return rap_impl(
                P_blk, A_blk, offs_P=op, offs_A=oa, offs_AP=oap,
                offs_out=oout, tol=float(nongalerkin_tol), chunk=32,
                shift=shift, rowmax_fn=rowmax_fn,
            )

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis)),
            out_specs=(P(None, axis), P(None)),
        )(P_data, data)

    out, rowmax1 = stage2(P_data, data, offs_P, offsets, offs_AP, offs_out)
    rm = np.asarray(rowmax1)
    kept = [k for k, o in enumerate(offs_out) if rm[k] > 0 or o == 0]
    offs_1 = tuple(offs_out[k] for k in kept)
    A1_data = out[np.asarray(kept, dtype=np.int32)]
    return cf, P_data, offs_P, A1_data, offs_1


def local_laplacian_dia_block(nx, ny, nz, lo, hi, cx=1.0, cy=1.0, cz=1.0,
                              dtype=np.float64):
    """Rows [lo, hi) of the 3D 7-pt Laplacian as a row-aligned diagonal
    block [7, hi-lo] + the global offset list — per-shard local
    generation (par_laplace.c GenerateLaplacian builds only its rank's
    rows; no rank holds the global operator)."""
    n = nx * ny * nz
    diag = (2.0 * cx if nx > 1 else 0.0) + (2.0 * cy if ny > 1 else 0.0) \
        + (2.0 * cz if nz > 1 else 0.0)
    live = [(-nx * ny, -cz), (-nx, -cy), (-1, -cx), (0, diag),
            (1, -cx), (nx, -cy), (nx * ny, -cz)]
    live = [(o, v) for o, v in live if v != 0.0 or o == 0]
    idx = np.arange(lo, hi, dtype=np.int64)
    ix = idx % nx
    iy = (idx // nx) % ny
    iz = idx // (nx * ny)
    data = np.zeros((len(live), hi - lo), dtype=dtype)
    for k, (off, v) in enumerate(live):
        if off == 0:
            data[k] = v
            continue
        if abs(off) == 1:
            ok = (ix + np.sign(off) >= 0) & (ix + np.sign(off) < nx)
        elif abs(off) == nx:
            ok = (iy + np.sign(off) >= 0) & (iy + np.sign(off) < ny)
        else:
            ok = (iz + np.sign(off) >= 0) & (iz + np.sign(off) < nz)
        data[k] = np.where(ok, v, 0.0)
    return data, tuple(o for o, _ in live)
