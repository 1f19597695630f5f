"""Distributed AMG setup for GENERAL sharded CSR operators.

This is the general-matrix counterpart of parallel/dist_setup.py (which
covers row-aligned DIA lattices): the reference's setup pipeline is
MPI-parallel for arbitrary ParCSR matrices —

  * PMIS exchanges measures / CF markers through CommPkg halo jobs
    (parcsr_ls/par_coarsen.c:2741 hypre_BoomerAMGCoarsenPMISHost), with
    S^T influence flowing through the TRANSPOSED comm pattern
    (parcsr_mv/communicationT.c);
  * interpolation fetches the remote rows its distance-2 terms need
    with hypre_ParCSRMatrixExtractBExt (parcsr_mv/par_csr_matop.c:1655);
  * the Galerkin product is hypre_ParMatmul (par_csr_matop.c:277):
    local rows x (local + fetched-remote) rows, then contributions to
    externally-owned coarse rows ship back to their owners.

TPU-native re-expression over a ParCSR (diag/offd ELL + HaloPlan):

  * `dist_pmis` runs the WHOLE strength + measure + iterated
    independent-set loop device-resident inside one jax.shard_map:
    forward ghost values ride `halo.exchange` (ppermute plans, the
    CommPkg analog) and S^T contributions ride `halo.reverse_exchange`
    (scatter back to owners with add/max combine, the communicationT
    analog).  Because every comparison uses the same f64 measures
    (count + Park-Miller rand) in the same order as the host path, the
    CF split is BIT-IDENTICAL to coarsen.pmis_coarsen on the assembled
    matrix — the .saved "identical across process counts" contract.
  * `dist_classical_interp` / `dist_rap` run per-shard on the host,
    touching ONLY the shard's own rows plus the ghost rows named by its
    halo plan (the BExt fetch list); no step ever forms the global
    matrix in one image.  P rows are bit-identical to the serial
    interp (same per-row arithmetic on identical inputs); the coarse
    operator matches to roundoff (contribution-sum order differs, as
    it does across MPI layouts in the reference).

The chain iterates level-to-level (`dist_csr_hierarchy`), covering the
0->1 AND 1->2 transitions the lattice path could not.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solvers.amg.coarsen import C_PT, F_PT, SF_PT, _PMIS_SEED
from ..utils.lcg import lcg_fill
from .halo import exchange, reverse_exchange
from .mesh import AXIS
from .par_csr import ParCSR
from .partition import block_partition
from ..utils.errors import arg_error


# ----------------------------------------------------------------------
# device-sharded strength + PMIS
# ----------------------------------------------------------------------

def _strength_slots(dv, dc, ov, oc, per, gw, theta, max_row_sum):
    """Per-slot strong masks (sd over diag ELL, so over offd ELL) —
    par_strength.c hypre_BoomerAMGCreateS over the diag/offd split.
    ELL pad slots hold value 0.0 and can never pass the strict test
    (row_scale is initialized to 0.0 exactly as in the reference, so
    theta*scale is always >= 0 for negative-diagonal rows and <= 0
    otherwise)."""
    rows = jnp.arange(per, dtype=dc.dtype)
    is_diag_slot = dc == rows[:, None]
    diag = jnp.sum(jnp.where(is_diag_slot, dv, 0.0), axis=1)
    neg = diag < 0

    offv = jnp.where(is_diag_slot, 0.0, dv)
    row_max = jnp.maximum(jnp.max(offv, axis=1), jnp.max(ov, axis=1))
    row_max = jnp.maximum(row_max, 0.0)  # hypre inits row_scale to 0.0
    row_min = jnp.minimum(jnp.min(offv, axis=1), jnp.min(ov, axis=1))
    row_min = jnp.minimum(row_min, 0.0)
    scale = jnp.where(neg, row_max, row_min)
    thresh = theta * scale

    sd = jnp.where(neg[:, None], dv > thresh[:, None], dv < thresh[:, None])
    sd = sd & ~is_diag_slot
    so = jnp.where(neg[:, None], ov > thresh[:, None], ov < thresh[:, None])
    so = so & (oc < gw)  # exclude pad-sink slots

    if max_row_sum < 1.0:
        rs = jnp.sum(dv, axis=1) + jnp.sum(ov, axis=1)
        weak_row = jnp.abs(rs) > jnp.abs(diag) * max_row_sum
        sd = sd & ~weak_row[:, None]
        so = so & ~weak_row[:, None]
    return sd, so


def dist_pmis(
    A: ParCSR,
    seed: int = _PMIS_SEED,
    theta: float = 0.25,
    max_row_sum: float = 0.9,
) -> np.ndarray:
    """Sharded PMIS over a general ParCSR: returns the GLOBAL CF marker
    (int64, C_PT/F_PT/SF_PT), bit-identical to
    coarsen.pmis_coarsen(strength_matrix(A)).

    All measure traffic is collective: forward candidate measures ride
    the matrix's halo plan (par_coarsen.c:2741's CommPkg int jobs), and
    the S^T influence direction rides reverse_exchange — each row
    scatter-maxes its candidate measure onto the columns it strongly
    depends on, local columns directly and remote columns through the
    transposed plan (communicationT.c)."""
    mesh, axis, plan = A.mesh, A.axis, A.plan
    S = mesh.shape[axis]
    per = A.part.rows_per_shard
    gw = plan.ghost_width
    theta = float(theta)
    max_row_sum = float(max_row_sum)

    # per-shard Park-Miller draws for global rows [s*per, (s+1)*per)
    # (par_indepset.c:33-62 seq_rand path: rank p skips first_row draws)
    rand = np.empty(S * per, dtype=np.float64)
    for s in range(S):
        rand[s * per:(s + 1) * per] = lcg_fill(seed, per, skip=s * per)
    rand = jax.device_put(rand, NamedSharding(mesh, P(axis)))

    def body(dv, dc, ov, oc, rand_blk):
        dv, dc, ov, oc = dv[0], dc[0], ov[0], oc[0]
        sd, so = _strength_slots(dv, dc, ov, oc, per, gw, theta, max_row_sum)

        # S^T column counts: local scatter + transposed-comm combine
        cnt = jnp.zeros(per, jnp.int32).at[dc].add(sd.astype(jnp.int32))
        gcnt = jnp.zeros(gw + 1, jnp.int32).at[oc].add(so.astype(jnp.int32))
        cnt = cnt + reverse_exchange(plan, gcnt, axis, per, "add")
        measure = cnt.astype(jnp.float64) + rand_blk

        isolated = ~(jnp.any(sd, axis=1) | jnp.any(so, axis=1))
        cf0 = jnp.where(isolated, jnp.int32(SF_PT), jnp.int32(0))
        in0 = ~isolated
        m0 = jnp.where(isolated, 0.0, measure)

        def step(st):
            it, cf, in_graph, m = st
            cand = in_graph & (m > 1.0)
            mc = jnp.where(cand, m, 0.0)

            ghost_mc = exchange(plan, mc, axis)          # [gw+1]
            # dominance along S rows (i depends on j)
            madj = jnp.maximum(
                jnp.max(jnp.where(sd, mc[dc], 0.0), axis=1),
                jnp.max(jnp.where(so, ghost_mc[oc], 0.0), axis=1),
            )
            # dominance along S^T (j depends on i): scatter-max back
            stl = jnp.zeros(per).at[dc].max(
                jnp.where(sd, mc[:, None], 0.0))
            stg = jnp.zeros(gw + 1).at[oc].max(
                jnp.where(so, mc[:, None], 0.0))
            madj = jnp.maximum(madj, stl)
            madj = jnp.maximum(
                madj, reverse_exchange(plan, stg, axis, per, "max"))

            in_is = cand & ~(madj > m)
            cf = jnp.where(in_is, jnp.int32(C_PT), cf)

            is_c = cf > 0
            ghost_c = exchange(plan, is_c.astype(jnp.int32), axis)
            infl_c = (
                jnp.any(sd & (is_c[dc]), axis=1)
                | jnp.any(so & (ghost_c[oc] > 0), axis=1)
            )
            newly_f = in_graph & (m < 1.0)
            newly_f = newly_f | (in_graph & ~is_c & infl_c)

            cf = jnp.where(in_graph & is_c, jnp.int32(C_PT), cf)
            cf = jnp.where(newly_f, jnp.int32(F_PT), cf)
            settled = in_graph & (cf != 0)
            m = jnp.where(settled, 0.0, m)
            in_graph = in_graph & (cf == 0)
            return it + 1, cf, in_graph, m

        def cond(st):
            it, cf, in_graph, m = st
            alive = jax.lax.psum(jnp.any(in_graph).astype(jnp.int32), axis)
            return (alive > 0) & (it < 500)

        _, cf, _, _ = jax.lax.while_loop(
            cond, step, (jnp.asarray(0), cf0, in0, m0))
        return cf

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None), P(axis)),
        out_specs=P(axis),
    )
    cf = jax.jit(mapped)(
        A.diag_data.astype(jnp.float64), A.diag_cols,
        A.offd_data.astype(jnp.float64), A.offd_cols, rand,
    )
    return np.asarray(cf)[: A.n].astype(np.int64)


# ----------------------------------------------------------------------
# per-shard host phases (BExt-structured: local rows + plan ghost rows)
# ----------------------------------------------------------------------

def _fetch_rows(blocks, part, gids, shape):
    """Rows `gids` gathered from their owners' blocks (batched per
    owner — the ExtractBExt fetch, par_csr_matop.c:1655), placed at
    their global row positions in a `shape` CSR."""
    gids = np.asarray(gids, dtype=np.int64)
    rr, cc, vv = [], [], []
    if gids.size:
        owners = part.owner(gids)
        for o in np.unique(owners):
            sel = gids[owners == o]
            sub = blocks[int(o)][sel - int(o) * part.rows_per_shard].tocoo()
            rr.append(sel[sub.row])
            cc.append(sub.col.astype(np.int64))
            vv.append(sub.data)
    rows = np.concatenate(rr) if rr else np.empty(0, np.int64)
    cols = np.concatenate(cc) if cc else np.empty(0, np.int64)
    vals = np.concatenate(vv) if vv else np.empty(0)
    M = sp.csr_matrix((vals, (rows, cols)), shape=shape)
    M.sort_indices()
    return M


def _sub_rows(A: ParCSR, s: int) -> sp.csr_matrix:
    """The n x n matrix holding ONLY the rows shard s can see: its own
    block plus the ghost rows named by its col_map (the
    hypre_ParCSRMatrixExtractBExt fetch set, par_csr_matop.c:1655).
    Every other row is empty."""
    per = A.part.rows_per_shard
    n = A.n
    lo = min(s * per, n)
    hi = min(lo + per, n)
    own = np.arange(lo, hi, dtype=np.int64)
    gids = np.concatenate([own, np.asarray(A.col_maps[s], dtype=np.int64)])
    return _fetch_rows(A.host_blocks, A.part, gids, (n, n))


def dist_classical_interp(A: ParCSR, cf: np.ndarray):
    """Per-shard classical interpolation (hypre interp_type 0,
    par_interp.c hypre_BoomerAMGBuildInterp): each shard computes the P
    rows of ITS fine rows from its local rows + fetched ghost rows.
    Returns (P: ParCSR rectangular n x nc, blocks: per-shard scipy).
    Rows are bit-identical to interp.classical_interp on the assembled
    matrix (identical per-row arithmetic on identical inputs)."""
    from ..solvers.amg.interp import classical_interp
    from ..solvers.amg.strength import strength_matrix

    S = A.part.n_shards
    per = A.part.rows_per_shard
    nc = int((cf > 0).sum())
    blocks = []
    for s in range(S):
        lo = min(s * per, A.n)
        hi = min(lo + per, A.n)
        Asub = _sub_rows(A, s)
        Ssub = strength_matrix(Asub)
        Psub = classical_interp(Asub, Ssub, cf)
        blocks.append(Psub[lo:hi].tocsr())

    cpart = block_partition(nc, S)
    Ppar = ParCSR.from_row_blocks(
        blocks, (A.n, nc), mesh=A.mesh, axis=A.axis, col_part=cpart,
    )
    # blocks are per-shard P rows over GLOBAL coarse columns
    return Ppar, blocks


def dist_rap(A: ParCSR, P_blocks, nc: int):
    """Distributed Galerkin product A1 = P^T A P (hypre_ParMatmul +
    triple product, par_csr_matop.c:277 / par_csr_triplemat.c):

      per shard s:  AP_s  = A_rows(s) @ P_(local + ghost rows)
                    C_s   = P_rows(s)^T @ AP_s      (contributions)
      owner t sums the C_s rows that land in its coarse block
      (the transposed-comm add-combine, communicationT.c).

    Returns the coarse ParCSR over the uniform coarse block partition.
    Matches the serial galerkin_rap to roundoff (sum order differs by
    shard, exactly as MPI layouts differ in the reference)."""
    S = A.part.n_shards
    per = A.part.rows_per_shard
    n = A.n
    cpart = block_partition(nc, S)
    cper = cpart.rows_per_shard

    # P rows each shard can see, in the n x nc global index space
    def P_visible(s):
        lo = min(s * per, n)
        hi = min(lo + per, n)
        own = np.arange(lo, hi, dtype=np.int64)
        gids = np.concatenate(
            [own, np.asarray(A.col_maps[s], dtype=np.int64)])
        return _fetch_rows(P_blocks, A.part, gids, (n, nc))

    # per-target accumulation (each owner sums incoming contributions)
    per_target = [[] for _ in range(S)]
    for s in range(S):
        lo = min(s * per, n)
        hi = min(lo + per, n)
        Arows = _shard_rows_global(A, s)          # n x n, local rows only
        Pvis = P_visible(s)
        AP = (Arows @ Pvis).tocsr()               # rows [lo,hi) populated
        Pl = P_blocks[s]                          # (hi-lo) x nc
        C = (Pl.T @ AP[lo:hi]).tocsr()            # nc x nc contribution
        for t in range(S):
            clo = min(t * cper, nc)
            chi = min(clo + cper, nc)
            blk = C[clo:chi]
            if blk.nnz:
                per_target[t].append(blk)

    blocks = []
    for t in range(S):
        clo = min(t * cper, nc)
        chi = min(clo + cper, nc)
        acc = sp.csr_matrix((chi - clo, nc))
        for blk in per_target[t]:
            acc = acc + blk
        acc.sort_indices()
        blocks.append(acc.tocsr())

    return ParCSR.from_row_blocks(
        blocks, (nc, nc), mesh=A.mesh, axis=A.axis, col_part=cpart)


def _shard_rows_global(A: ParCSR, s: int) -> sp.csr_matrix:
    """Shard s's own rows placed at their global positions (n x n)."""
    per = A.part.rows_per_shard
    n = A.n
    lo = min(s * per, n)
    hi = min(lo + per, n)
    blk = A.host_blocks[s][: hi - lo].tocoo()
    return sp.csr_matrix(
        (blk.data, (blk.row + lo, blk.col)), shape=(n, n)).tocsr()


# ----------------------------------------------------------------------
# level driver
# ----------------------------------------------------------------------

def dist_csr_setup(
    A: ParCSR,
    *,
    seed: int = _PMIS_SEED,
    theta: float = 0.25,
    max_row_sum: float = 0.9,
):
    """One setup level: sharded PMIS -> per-shard classical interp ->
    distributed RAP.  Returns (cf, P: ParCSR, A1: ParCSR)."""
    cf = dist_pmis(A, seed=seed, theta=theta, max_row_sum=max_row_sum)
    Ppar, P_blocks = dist_classical_interp(A, cf)
    nc = int((cf > 0).sum())
    A1 = dist_rap(A, P_blocks, nc)
    return cf, Ppar, A1


def dist_csr_hierarchy(
    A: ParCSR,
    *,
    max_levels: int = 3,
    min_coarse: int = 32,
    seed: int = _PMIS_SEED,
    theta: float = 0.25,
    max_row_sum: float = 0.9,
):
    """Iterate dist_csr_setup down the hierarchy (the par_amg_setup.c:27
    while-loop), keeping every transition sharded.  Returns
    (levels, Ps, cfs) where levels[0] is A."""
    levels, Ps, cfs = [A], [], []
    cur = A
    while len(levels) < max_levels and cur.n > min_coarse:
        cf, Ppar, A1 = dist_csr_setup(
            cur, seed=seed, theta=theta, max_row_sum=max_row_sum)
        nc = int((cf > 0).sum())
        if nc == 0 or nc >= cur.n:
            break
        cfs.append(cf)
        Ps.append(Ppar)
        levels.append(A1)
        cur = A1
    return levels, Ps, cfs


# ----------------------------------------------------------------------
# standalone distributed matrix products (parcsr_mv analogs)
# ----------------------------------------------------------------------

def par_matmul(A: ParCSR, B: ParCSR) -> ParCSR:
    """C = A @ B for general distributed CSR (hypre_ParMatmul,
    par_csr_matop.c:277): per shard, A's local rows multiply B's
    visible rows — B's local block plus the remote rows named by A's
    offd column map, fetched batched per owner (the
    hypre_ParCSRMatrixExtractBExt role, par_csr_matop.c:1655).  C
    keeps A's row partition and B's column partition; no shard ever
    holds a global matrix."""
    if A.m != B.n:
        raise arg_error(f"shape mismatch: {A.m} vs {B.n}")
    S = A.part.n_shards
    per = A.part.rows_per_shard
    blocks = []
    for s in range(S):
        lo = min(s * per, A.n)
        hi = min(lo + per, A.n)
        own = np.arange(min(s * B.part.rows_per_shard, B.n),
                        min(s * B.part.rows_per_shard
                            + B.part.rows_per_shard, B.n), dtype=np.int64)
        gids = np.unique(np.concatenate(
            [own, np.asarray(A.col_maps[s], dtype=np.int64)]))
        gids = gids[gids < B.n]
        Bvis = _fetch_rows(B.host_blocks, B.part, gids, (A.m, B.m))
        Cs = (A.host_blocks[s][: hi - lo] @ Bvis).tocsr()
        Cs.sort_indices()
        blocks.append(Cs)
    return ParCSR.from_row_blocks(
        blocks, (A.n, B.m), mesh=A.mesh, axis=A.axis,
        col_part=B.col_part)


def par_transpose(A: ParCSR) -> ParCSR:
    """C = A^T for distributed CSR (hypre_ParCSRMatrixTranspose,
    par_csr_matop.c:1700): each shard transposes its local row block
    and ships the resulting rows to their owners under A's COLUMN
    partition, which sum contributions (the reverse/transposed-comm
    add-combine, communicationT.c)."""
    S = A.part.n_shards
    per = A.part.rows_per_shard
    tpart = A.col_part
    tn, tm = A.m, A.n
    per_target: list[list] = [[] for _ in range(S)]
    for s in range(S):
        lo = min(s * per, A.n)
        hi = min(lo + per, A.n)
        blk = A.host_blocks[s][: hi - lo].tocoo()
        # transposed coordinates in the (tn x tm) global space
        rows_t = blk.col.astype(np.int64)
        cols_t = blk.row.astype(np.int64) + lo
        owners = tpart.owner(rows_t)
        for t in np.unique(owners):
            sel = owners == t
            tlo = min(int(t) * tpart.rows_per_shard, tn)
            thi = min(tlo + tpart.rows_per_shard, tn)
            per_target[int(t)].append(sp.csr_matrix(
                (blk.data[sel], (rows_t[sel] - tlo, cols_t[sel])),
                shape=(thi - tlo, tm)))
    blocks = []
    for t in range(S):
        tlo = min(t * tpart.rows_per_shard, tn)
        thi = min(tlo + tpart.rows_per_shard, tn)
        acc = sp.csr_matrix((thi - tlo, tm))
        for b in per_target[t]:
            acc = acc + b
        acc.sort_indices()
        blocks.append(acc.tocsr())
    return ParCSR.from_row_blocks(
        blocks, (tn, tm), mesh=A.mesh, axis=A.axis, col_part=A.part)
