"""Faithful distributed hybrid Gauss-Seidel (relax 3/4/6, 13/14/8).

Reference: par_relax.c:1050-1086 — hypre's hybrid smoothers are DEFINED
by the process decomposition: within a rank the sweep is sequential
Gauss-Seidel over the local diagonal block (latest values), across
ranks it is Jacobi (off-rank columns read the iterate frozen at sweep
start).  Round-2 degenerated all of these to one diagonal-scaled Jacobi
sweep on sharded levels; this module supplies the real thing so sharded
iteration counts match multi-rank hypre rather than only the
Jacobi-family subset.

TPU design: each mesh shard owns a row block; its diagonal-block
dependency DAG is wavefront-scheduled EXACTLY like the single-device
GSSchedule (solvers/amg/relax.py, the par_relax.c:472-560 level-set
analog), but the per-shard schedules are stacked into batched arrays
sharded over the mesh axis.  One shard_map runs every shard's scan in
parallel; the off-shard ("offd") contribution is computed once per
sweep from the frozen iterate via matvec(u) - diag_block_matvec(u),
i.e. the CommPkg exchange happens once per sweep like hypre's.

L1 variants (13/14/8) divide by hypre's option-4 l1 norm
|a_ii| + sum_offd |a_ij| where "offd" = out-of-shard — the divisor is
shard-count-dependent exactly as hypre's is rank-count-dependent.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.csr import CSRMatrix
from ..solvers.amg.relax import build_gs_schedule


@dataclasses.dataclass
class ParGSSchedule:
    """Batched per-shard wavefront schedules (arrays sharded on axis 0).

    rows  [S, L, W]        local row index, sentinel = per (pad)
    acols [S, L, W, width] LOCAL column index, sentinel = per
    adata [S, L, W, width]
    dinv  [S, L, W]        1/divisor (0 at pads)
    """

    rows: jax.Array
    acols: jax.Array
    adata: jax.Array
    dinv: jax.Array
    per: int


def build_par_gs_schedule(
    Ah, part, mesh, axis: str, forward: bool, l1: bool, dtype,
    mask=None,
) -> ParGSSchedule:
    """Host: per-shard diagonal-block schedules, padded + stacked.

    Ah: global scipy CSR.  part: block partition (rows_per_shard).
    l1: divisor = |a_ii| + sum_{j off-shard} |a_ij| (option-4 l1 norm,
    par_relax_more.c); else the plain diagonal.
    mask: optional GLOBAL boolean row mask (CF_marker > 0 for the C
    half-sweep, its complement for F) — relax_order=1 CF ordering
    (par_cycle.c:398): only masked rows relax, reading the latest
    in-shard values and sweep-start off-shard values like any hybrid
    sweep.
    """
    S = mesh.shape[axis]
    per = part.rows_per_shard
    n = Ah.shape[0]
    scheds = []
    for s in range(S):
        lo = s * per
        hi = min(lo + per, n)
        if hi <= lo:
            scheds.append(None)
            continue
        block = Ah[lo:hi, lo:hi].tocsr()
        block.sort_indices()
        diag = block.diagonal()
        if l1:
            full = Ah[lo:hi].tocsr()
            row_abs = np.asarray(np.abs(full).sum(axis=1)).ravel()
            in_abs = np.asarray(
                np.abs(Ah[lo:hi, lo:hi]).sum(axis=1)
            ).ravel()
            div = np.abs(diag) + (row_abs - in_abs)
            div = np.where(diag < 0, -div, div)  # sign follows diagonal
        else:
            div = diag
        div = np.where(div == 0, 1.0, div)
        scheds.append(
            build_gs_schedule(
                CSRMatrix.from_scipy(block), forward=forward, divisor=div,
                mask=None if mask is None else np.asarray(mask[lo:hi]),
            )
        )

    Lmax = max((s.rows.shape[0] for s in scheds if s is not None), default=1)
    Wmax = max((s.rows.shape[1] for s in scheds if s is not None), default=1)
    wmax = max((s.acols.shape[2] for s in scheds if s is not None), default=1)
    rows = np.full((S, Lmax, Wmax), per, dtype=np.int32)
    acols = np.full((S, Lmax, Wmax, wmax), per, dtype=np.int32)
    adata = np.zeros((S, Lmax, Wmax, wmax), dtype=dtype)
    dinv = np.zeros((S, Lmax, Wmax), dtype=dtype)
    for s, sc in enumerate(scheds):
        if sc is None:
            continue
        L, W = sc.rows.shape
        w = sc.acols.shape[2]
        r = np.asarray(sc.rows)
        local_n = sc.n
        rows[s, :L, :W] = np.where(r >= local_n, per, r)
        ac = np.asarray(sc.acols)
        acols[s, :L, :W, :w] = np.where(ac >= local_n, per, ac)
        adata[s, :L, :W, :w] = np.asarray(sc.adata)
        dinv[s, :L, :W] = np.asarray(sc.dinv)
    shard = NamedSharding(mesh, P(axis, None, None))
    shard4 = NamedSharding(mesh, P(axis, None, None, None))
    return ParGSSchedule(
        rows=jax.device_put(rows, shard),
        acols=jax.device_put(acols, shard4),
        adata=jax.device_put(adata, shard4),
        dinv=jax.device_put(dinv, shard),
        per=per,
    )


def par_gauss_seidel(sched: ParGSSchedule, mesh, axis: str, u, g, weight=1.0):
    """One hybrid sweep: per-shard sequential GS over the diagonal block
    with right-hand side g = f - A_offshard @ u_frozen.  u/g are padded
    sharded vectors [S*per]."""
    per = sched.per

    def body(rows, acols, adata, dinv, u, g):
        rows, acols, adata, dinv = (a[0] for a in (rows, acols, adata, dinv))
        u_ext = jnp.concatenate([u.reshape(-1), jnp.zeros(1, u.dtype)])
        g_ext = jnp.concatenate([g.reshape(-1), jnp.zeros(1, g.dtype)])

        def step(u_ext, slab):
            r_, ac, ad, dv = slab
            res = g_ext[r_] - jnp.sum(ad * u_ext[ac], axis=-1)
            return u_ext.at[r_].add(weight * dv * res), None

        with jax.named_scope("RELAX"):
            u_ext, _ = jax.lax.scan(step, u_ext, (rows, acols, adata, dinv))
        return u_ext[:per]

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(axis, None, None),
            P(axis, None, None, None),
            P(axis, None, None, None),
            P(axis, None, None),
            P(axis),
            P(axis),
        ),
        out_specs=P(axis),
    )
    return mapped(sched.rows, sched.acols, sched.adata, sched.dinv, u, g)
