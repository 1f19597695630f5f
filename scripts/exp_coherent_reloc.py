"""Compare relocation assignments by the offset counts they induce.

The relocated DIA forms' storage is noffs x ncells; the ring-scan
assignment (relocate_to_cells) resolves collisions with incoherent
per-point displacements, exploding noffs (613/815 A-offsets at 96^3
levels 2/3 vs ~16 nnz/row).  A displacement-COHERENT assignment keeps
nearby points' displacements nearly equal so edge differences collapse.

Candidates measured here, per relocated level of the bench hierarchy:
  ring    — current production (baseline)
  desired —每 point's own cell, ignoring collisions (invalid; the floor)
  iso     — row-isotonic: per (cy,cz) row of cells, x-sorted points get
            strictly increasing cx via push-right-then-clamp; row
            overflow carried to the nearest row in y (then z) first.
Reports A-offset count, P/R parity-offset counts, and the nnz-coverage
of the top-K offsets (sizes the exact COO tail of a hybrid form).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp

import hypre_tpu  # noqa: F401
from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import (
    embedded_offset_count,
    parity_offset_count_plan,
    relocate_to_cells,
)
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions


def coherent(pos, fine_shape, factors, max_load=0.95):
    pos = np.asarray(pos, dtype=np.int64)
    nx, ny, nz = fine_shape
    fx, fy, fz = factors
    cxn, cyn, czn = nx // fx, ny // fy, nz // fz
    m = len(pos)
    if m > max_load * (cxn * cyn * czn):
        return None
    ix = pos % nx
    iy = (pos // nx) % ny
    iz = pos // (nx * ny)
    cx = ix // fx
    cy = (iy // fy).astype(np.int64)
    cz = (iz // fz).astype(np.int64)

    # ---- stage 1: row balancing (carry overflow along y, then z) -----
    row = cy + cyn * cz  # row id
    nrows = cyn * czn
    # order points within each row by x (stable; ties by fine x then pos)
    order = np.lexsort((pos, ix, row))
    row_s = row[order]
    counts = np.bincount(row_s, minlength=nrows)
    if counts.max() > cxn:
        # carry: iterate rows in (z, y) scan order; overflowing rows pass
        # their x-extreme points to the next row (wrapping to the next z
        # slab).  Rare at load <= 0.95 with Poisson-ish PMIS densities.
        idx_by_row = np.split(order, np.cumsum(counts)[:-1])
        carry = []
        for r in range(nrows):
            cur = list(idx_by_row[r]) + carry
            carry = []
            if len(cur) > cxn:
                # keep the cxn closest-to-center in x, carry the rest
                cur.sort(key=lambda i: ix[i])
                over = len(cur) - cxn
                carry = cur[-over:]
                cur = cur[:cxn]
            row[cur] = r
        if carry:
            # wrap leftovers into any row with space, scanning backward
            counts2 = np.bincount(row, minlength=nrows)
            free_rows = np.flatnonzero(counts2 < cxn)
            fi = 0
            for i in carry:
                while counts2[free_rows[fi]] >= cxn:
                    fi += 1
                row[i] = free_rows[fi]
                counts2[free_rows[fi]] += 1
        order = np.lexsort((pos, ix, row))
        row_s = row[order]
        counts = np.bincount(row_s, minlength=nrows)
    # ---- stage 2: per-row isotonic x assignment ----------------------
    # push-right pass: a_i = max(a_{i-1}+1, d_i) within each row, then
    # clamp from the right so a_i <= cxn - m_row + i.  Both vectorized
    # with segment-scan tricks.
    d = cx[order]
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos_in_row = np.arange(m) - np.repeat(starts[counts > 0], counts[counts > 0]) \
        if False else np.arange(m) - np.repeat(starts, counts)[:m]
    # push-right via prefix max of (d_i - i) per row
    b = d - pos_in_row
    # segmented cummax of b
    seg_id = np.repeat(np.arange(nrows), counts)[:m]
    bmax = b.copy()
    # numpy has no segmented cummax; emulate with maximum.accumulate and
    # resetting at segment starts using a large negative offset trick
    BIG = np.int64(1) << 40
    shifted = b + seg_id * BIG
    run = np.maximum.accumulate(shifted)
    bmax = run - seg_id * BIG
    a = bmax + pos_in_row
    # clamp from the right: a_i <= cxn - m_row + pos_in_row
    m_row = np.repeat(counts, counts)[:m]
    a = np.minimum(a, cxn - m_row + pos_in_row)
    cells = np.empty(m, dtype=np.int64)
    rr = row_s
    cells_o = a + cxn * rr
    cells[order] = cells_o
    assert len(np.unique(cells)) == m, "assignment not distinct"
    assert a.min() >= 0 and a.max() < cxn
    return cells


def measure(tag, rcell, A_k, Pf, lat_shape, factors):
    if rcell is None:
        print(f"  {tag}: does not fit")
        return
    offs_A = embedded_offset_count(A_k, rcell, rcell)
    p = parity_offset_count_plan(Pf, rcell, lat_shape, factors, False)
    r = parity_offset_count_plan(Pf.T.tocsr(), rcell, lat_shape, factors, True)
    # top-K nnz coverage of A offsets
    Ac = A_k.tocoo()
    offs = rcell[Ac.col] - rcell[Ac.row]
    uoff, inv = np.unique(offs, return_inverse=True)
    cnt = np.bincount(inv)
    cso = np.cumsum(np.sort(cnt)[::-1]) / cnt.sum()
    cov = {K: (cso[K - 1] if K <= len(uoff) else 1.0) for K in (32, 64, 96, 128)}
    covs = " ".join(f"top{K}={v:.4f}" for K, v in cov.items())
    print(f"  {tag}: A_offs={offs_A} P_offs={p} R_offs={r}  nnz-cov {covs}")


nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
A = laplacian_7pt(nx, nx, nx)
amg = BoomerAMG(
    A,
    BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        trunc_factor=0.0, relax_down=18, relax_up=18,
        dtype="float32", mat_dtype="bfloat16", nongalerkin_tol=0.02,
        relocate_level2=True, lattice_shape=(nx, nx, nx),
    ),
)
cpos0 = amg._plan_embed()
plan = amg._plan_reloc(cpos0)

# replay the chain with each strategy (the chain feeds rcell forward,
# so strategies change downstream positions too)
for strat in ("ring", "iso"):
    print(f"== strategy {strat}")
    lat_shape = tuple(int(s) for s in amg.opts.lattice_shape)
    pos_prev = cpos0
    for ent in plan:
        k = ent["k"]
        factors = ent["factors"]
        # recompute pos_k from the strategy's own chain
        pos_k = pos_prev[amg._cf[k - 1] > 0]
        if strat == "ring":
            rcell = relocate_to_cells(pos_k, lat_shape, factors)
        else:
            rcell = coherent(pos_k, lat_shape, factors)
        A_k = amg._host_A[k]
        Pk1 = amg._host_P[k - 1].tocoo()
        ncells_prev = int(np.prod(lat_shape))
        Pf = sp.csr_matrix(
            (Pk1.data, (pos_prev[Pk1.row], Pk1.col)),
            shape=(ncells_prev, A_k.shape[0]),
        )
        print(f" level {k}: n={A_k.shape[0]} lat={lat_shape} f={factors}")
        # the desired-diff floor (invalid assignment, diagnostic only)
        nxl, nyl, nzl = lat_shape
        fx, fy, fz = factors
        cxn, cyn = nxl // fx, nyl // fy
        ixp = pos_k % nxl
        iyp = (pos_k // nxl) % nyl
        izp = pos_k // (nxl * nyl)
        des = ixp // fx + cxn * (iyp // fy + cyn * (izp // fz))
        Ac = A_k.tocoo()
        floor = len(np.unique(des[Ac.col] - des[Ac.row]))
        print(f"  desired-diff floor: {floor}")
        measure(strat, rcell, A_k, Pf, lat_shape, factors)
        if rcell is None:
            break
        lat_shape = tuple(s // f for s, f in zip(lat_shape, factors))
        pos_prev = rcell
