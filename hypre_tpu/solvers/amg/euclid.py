"""Euclid-shape parallel ILU(k): subdomain graph + colored block solves.

Reference: distributed_ls/Euclid/ — SubdomainGraph_dh.c builds the
subdomain adjacency graph of the row-block decomposition and colors it
(greedy, by subdomain id) so that PILU elimination can order boundary
rows by color; ilu_seq.c factors each subdomain's interior; Euclid
applies the factors as a parallel preconditioner/smoother.  hypre
exposes it as BoomerAMG smooth_type 9 (par_amg.h smooth_type,
par_cycle.c: levels below smooth_num_levels smooth with the aux
smoother INSTEAD of relaxation).

TPU design: subdomains are contiguous row blocks (hypre's own model —
one per rank).  Each block's DIAGONAL sub-block is factored ILU(k) by
the native kernel; the factors assemble block-diagonally, so ONE global
pair of wavefront schedules (relax.py GSSchedule) applies every
domain's triangular solves in parallel — the wavefront levels of a
block-diagonal matrix are the unions of the per-domain levels.  Two
application modes:

  * additive (block-Jacobi): u += w * B^{-1} r — the across-rank limit
    hypre's Euclid smoother takes with one smoother sweep;
  * multiplicative by COLOR (the SubdomainGraph coloring put to work):
    colors run sequentially, all domains of one color update together
    from a fresh residual — a colored block Gauss-Seidel whose
    parallel width is the color class, strictly stronger than
    block-Jacobi at the cost of ncolors residual evaluations.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix
from .relax import GSSchedule, build_gs_schedule, gauss_seidel


def subdomain_graph(A: sp.csr_matrix, bounds: np.ndarray):
    """Adjacency of row-block subdomains (SubdomainGraph_dh role):
    i ~ j iff any coupling crosses the two blocks."""
    D = len(bounds) - 1
    Ac = A.tocoo()
    dom_r = np.searchsorted(bounds[1:], Ac.row, side="right")
    dom_c = np.searchsorted(bounds[1:], Ac.col, side="right")
    adj = [set() for _ in range(D)]
    cross = dom_r != dom_c
    for a, b in zip(dom_r[cross], dom_c[cross]):
        adj[a].add(int(b))
        adj[b].add(int(a))
    return adj


def color_subdomains(adj) -> np.ndarray:
    """Greedy coloring in subdomain-id order (SubdomainGraph_dh.c's
    ordering); returns color per domain."""
    D = len(adj)
    color = np.full(D, -1, dtype=np.int64)
    for d in range(D):
        used = {int(color[nb]) for nb in adj[d] if color[nb] >= 0}
        c = 0
        while c in used:
            c += 1
        color[d] = c
    return color


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EuclidData:
    Lsched: GSSchedule
    Usched: GSSchedule
    color_of_row: jax.Array  # int32 [n]
    ncolors: int = dataclasses.field(metadata=dict(static=True))
    colored: bool = dataclasses.field(metadata=dict(static=True))


def build_euclid(
    A: sp.csr_matrix,
    num_domains: int = 4,
    fill_level: int = 1,
    colored: bool = True,
) -> EuclidData:
    """Factor the block-diagonal part per subdomain + schedules."""
    from .ilu import ilu0_factor, iluk_factor

    A = A.tocsr()
    n = A.shape[0]
    D = max(1, min(num_domains, n))
    bounds = np.linspace(0, n, D + 1).astype(np.int64)
    adj = subdomain_graph(A, bounds)
    color = color_subdomains(adj)
    ncolors = int(color.max()) + 1 if D else 1

    Ls, Us = [], []
    for d in range(D):
        lo, hi = bounds[d], bounds[d + 1]
        blk = A[lo:hi, lo:hi].tocsr()
        if fill_level == 0:
            L, U = ilu0_factor(blk)
        else:
            L, U = iluk_factor(blk, fill_level)
        Ls.append(L)
        Us.append(U)
    Lb = sp.block_diag(Ls, format="csr")
    Ub = sp.block_diag(Us, format="csr")
    Lb.sort_indices()
    Ub.sort_indices()
    Lsched = build_gs_schedule(
        CSRMatrix.from_scipy(Lb), forward=True, divisor=np.ones(n)
    )
    Usched = build_gs_schedule(
        CSRMatrix.from_scipy(Ub), forward=False, divisor=Ub.diagonal()
    )
    row_dom = np.searchsorted(bounds[1:], np.arange(n), side="right")
    return EuclidData(
        Lsched=Lsched,
        Usched=Usched,
        color_of_row=jnp.asarray(color[row_dom].astype(np.int32)),
        ncolors=ncolors,
        colored=bool(colored),
    )


def euclid_apply(ed: EuclidData, r):
    """B^{-1} r (all domains at once: block-diagonal triangular pair)."""
    y = gauss_seidel(ed.Lsched, jnp.zeros_like(r), r)
    return gauss_seidel(ed.Usched, jnp.zeros_like(y), y)


def euclid_smooth(ed: EuclidData, matvec, u, f, weight=1.0):
    """One Euclid smoothing sweep.

    colored=False: block-Jacobi  u += w * B^{-1} (f - A u).
    colored=True: colored block GS — per color c (sequential), domains
    of color c update from the CURRENT residual; other rows' updates
    are masked out.
    """
    if not ed.colored:
        r = f - matvec(u)
        return u + weight * euclid_apply(ed, r)
    for c in range(ed.ncolors):
        r = f - matvec(u)
        upd = euclid_apply(ed, r)
        u = u + jnp.where(ed.color_of_row == c, weight * upd, 0.0)
    return u
