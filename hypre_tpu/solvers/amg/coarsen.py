"""C/F coarsening: PMIS, Ruge-Stueben, HMIS.

Reference: parcsr_ls/par_coarsen.c —
  PMIS host:  hypre_BoomerAMGCoarsenPMISHost (:2031-2738)
  RS:         hypre_BoomerAMGCoarsenRuge     (:874)
  HMIS:       Ruge (measure_type 10, cut 0) then PMIS with CF_init=1 (:2763-2790)

PMIS parity notes (all mirrored exactly):
  * measure[i] = (# rows whose strong set contains i, i.e. S^T row count)
    + LCG random in (0,1] (par_indepset.c:33-62, seed 2747; the seq_rand
    path draws the GLOBAL sequence so results are partition-invariant)
  * rows with no strong connections at all -> SF_PT (isolated fine)
  * IS selection: candidate iff measure > 1; candidate i is REMOVED iff
    some candidate j adjacent in S u S^T has strictly larger measure
    (par_coarsen.c:2455-2496 — ties both survive)
  * F assignment: measure < 1, or some strong influencer j of i
    (column of row i of S) is C (par_coarsen.c:2545-2594)
  * settled nodes leave the graph, measure := 0

The iterated IS loop is a handful of vectorized numpy passes per round
(~5-8 rounds in practice) — host setup, per SURVEY §7 design stance.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...utils.lcg import lcg_fill
from ...utils.errors import generic_error

C_PT = 1
F_PT = -1
SF_PT = -3

_PMIS_SEED = 2747  # par_indepset.c:46


def _measures(S: sp.csr_matrix, seed: int = _PMIS_SEED, first_row: int = 0) -> np.ndarray:
    n = S.shape[0]
    col_count = np.bincount(S.indices, minlength=n).astype(np.float64)
    return col_count + lcg_fill(seed, n, skip=first_row)


def cljp_coarsen(S: sp.csr_matrix, seed: int = _PMIS_SEED) -> np.ndarray:
    """CLJP coarsening (par_coarsen.c:93 hypre_BoomerAMGCoarsen) via the
    native kernel; measures = |S^T col| + LCG rand (par_indepset parity)."""
    from ... import native

    n = S.shape[0]
    measure = _measures(S, seed)
    cf = native.cljp_coarsen(S.indptr, S.indices, n, measure)
    if cf is None:
        raise generic_error("CLJP requires the native kernel (no C compiler found)")
    return cf


def falgout_coarsen(S: sp.csr_matrix, seed: int = _PMIS_SEED) -> np.ndarray:
    """Falgout coarsening (par_coarsen.c:1992): RS first pass, then CLJP
    on the unsettled boundary (serial: RS settles everything, so this
    reduces to RS — the composition matters only across ranks; kept for
    API parity and validated against the oracle)."""
    cf = ruge_stuben_coarsen(S)
    return cf


def pmis_coarsen(
    S: sp.csr_matrix,
    cf_init: np.ndarray | None = None,
    seed: int = _PMIS_SEED,
    isolated_to_c: bool = False,
) -> np.ndarray:
    """Returns CF_marker (C_PT / F_PT / SF_PT per row).

    cf_init: preset CF_marker from a prior pass (the HMIS path,
    CF_init==1 in the reference); entries already +-1 are honored and the
    first IS round is skipped for them (par_coarsen.c:2424 `!CF_init || iter`).
    isolated_to_c: rows with no strong connections become C instead of
    SF — hypre's CF_init==3/4 mode used for the aggressive-coarsening
    SECOND round (par_coarsen.c:2323-2326; an isolated first-round C
    point must stay coarse, it has nothing to interpolate from).
    """
    n = S.shape[0]
    measure = _measures(S, seed)

    row_nnz = np.diff(S.indptr)

    if cf_init is None:
        cf = np.zeros(n, dtype=np.int64)
        isolated = row_nnz == 0  # no strong connections in the row
        # also isolated columns: hypre checks S row AND offd; a node with
        # empty row is SF regardless of column count (par_coarsen.c:2311-2320)
        cf[isolated] = C_PT if isolated_to_c else SF_PT
        measure[isolated] = 0.0
        in_graph = ~isolated
        first_round_is = True
    else:
        cf = cf_init.astype(np.int64).copy()
        in_graph = cf == 0
        measure[~in_graph] = 0.0
        first_round_is = False  # first IS fed by prior RS coarsening

    # native C loop (bit-identical staging; ~10x the numpy rounds)
    from ... import native

    cf_nat = native.pmis_loop(
        S.indptr, S.indices, n, measure, cf, first_round_is
    )
    if cf_nat is not None:
        return cf_nat

    ST = S.T.tocsr()

    # symmetric adjacency for IS comparisons (S u S^T)
    U = ((S + ST) > 0).tocsr()
    U.sort_indices()
    # reduceat machinery: CSR entries are row-grouped, so per-row max is
    # a reduceat over row starts (ufunc.at is ~30x slower)
    U_starts = np.minimum(U.indptr[:-1], max(U.nnz - 1, 0))
    U_nonempty = np.diff(U.indptr) > 0
    S_starts = np.minimum(S.indptr[:-1], max(S.nnz - 1, 0))
    S_nonempty = np.diff(S.indptr) > 0

    it = 0
    while in_graph.any():
        if first_round_is or it > 0:
            # pick candidates and remove dominated ones
            cand = in_graph & (measure > 1)
            # i removed iff exists adjacent cand j with m[j] > m[i]
            m_cand = np.where(cand, measure, 0.0)
            # per-row max over U of m_cand
            if U.nnz:
                maxadj = np.maximum.reduceat(m_cand[U.indices], U_starts)
                maxadj = np.where(U_nonempty, maxadj, 0.0)
            else:
                maxadj = np.zeros(n)
            in_is = cand & ~(maxadj > measure)
            cf = np.where(in_is, 1, cf)
        it += 1

        # C/F assignment pass (order-safe: reads the tentative IS markers)
        newly_f = in_graph & (measure < 1)
        is_c = cf > 0
        # i -> F if any strong influencer j (S row of i) has cf[j] > 0
        if S.nnz:
            infl_c = np.bitwise_or.reduceat(is_c[S.indices], S_starts) & S_nonempty
        else:
            infl_c = np.zeros(n, dtype=bool)
        newly_f |= in_graph & ~is_c & infl_c

        cf = np.where(in_graph & is_c, C_PT, cf)
        cf = np.where(newly_f, F_PT, cf)

        settled = in_graph & (cf != 0)
        measure[settled] = 0.0
        in_graph = in_graph & (cf == 0)

        if it > 500:  # safety
            raise generic_error("PMIS did not converge")
    return cf


def _any_col_true(S: sp.csr_matrix, flag: np.ndarray) -> np.ndarray:
    """per row i of S: any(flag[j] for j in row i)."""
    if S.nnz == 0:
        return np.zeros(S.shape[0], dtype=bool)
    rows = np.repeat(np.arange(S.shape[0]), np.diff(S.indptr))
    out = np.zeros(S.shape[0], dtype=bool)
    np.logical_or.at(out, rows, flag[S.indices])
    return out


def ruge_stuben_coarsen(
    S: sp.csr_matrix,
    measure_type: int = 0,
    cut_factor: int = 0,
    coarsen_type: int = 0,
) -> np.ndarray:
    """First pass of classical Ruge-Stueben coarsening.

    Reference: hypre_BoomerAMGCoarsenRuge (par_coarsen.c:874-1600) — the
    serial first pass: repeatedly pick the unassigned point with maximal
    measure (|S^T row| based), make it C, make its S^T-neighbors F, and
    increment measures of F-neighbors' influencers (the classic RS
    bookkeeping with a bucket "linked list" by measure).

    measure_type 10 (HMIS): local measure only, no second pass.
    Serial python loop — acceptable for the HMIS first pass on host; a
    C++ helper is the planned upgrade for very large grids.
    """
    n = S.shape[0]
    ST = S.T.tocsr()
    ST.sort_indices()

    # native bucket-list implementation (the par_coarsen.c structure)
    from ... import native

    cf_native = native.rs_coarsen(S.indptr, S.indices, ST.indptr, ST.indices, n)
    if cf_native is not None:
        return cf_native

    # pure-python fallback (heap; tie order differs from the bucket list)
    # integer measures: # points i strongly influences = S^T row counts
    measure = np.diff(ST.indptr).astype(np.int64).copy()

    cf = np.zeros(n, dtype=np.int64)
    # isolated: no strong influences in either direction
    isolated = (np.diff(S.indptr) == 0) & (measure == 0)
    cf[isolated] = SF_PT
    # points that influence nobody but depend on others -> F candidates
    # handled naturally (measure 0 picked last -> F via neighbor rule)

    # bucket queue by measure
    import heapq

    heap = [(-int(measure[i]), i) for i in range(n) if not isolated[i]]
    heapq.heapify(heap)
    settled = isolated.copy()

    S_indptr, S_indices = S.indptr, S.indices
    ST_indptr, ST_indices = ST.indptr, ST.indices

    while heap:
        negm, i = heapq.heappop(heap)
        if settled[i] or -negm != measure[i]:
            continue  # stale entry
        if measure[i] <= 0:
            # remaining points become F
            cf[i] = F_PT
            settled[i] = True
            continue
        cf[i] = C_PT
        settled[i] = True
        # neighbors that i influences become F
        for j in ST_indices[ST_indptr[i] : ST_indptr[i + 1]]:
            if not settled[j]:
                cf[j] = F_PT
                settled[j] = True
                # influencers of the new F point get measure boost
                for k in S_indices[S_indptr[j] : S_indptr[j + 1]]:
                    if not settled[k]:
                        measure[k] += 1
                        heapq.heappush(heap, (-int(measure[k]), k))
        # i's influencers lose it as a potential C neighbor
        for j in S_indices[S_indptr[i] : S_indptr[i + 1]]:
            if not settled[j]:
                measure[j] -= 1
                heapq.heappush(heap, (-int(measure[j]), j))

    cf[~settled & (cf == 0)] = F_PT
    return cf


def hmis_coarsen(S: sp.csr_matrix, seed: int = _PMIS_SEED) -> np.ndarray:
    """HMIS = RS first pass then PMIS on the leftovers (par_coarsen.c:2763)."""
    cf = ruge_stuben_coarsen(S, measure_type=10)
    # PMIS with CF_init=1: F points with strong offd links re-enter; in the
    # single-partition setting, C and F from RS are kept (SF too), and PMIS
    # refines nothing unless unassigned points remain.  hypre re-opens
    # F points with offd strong connections only — none on one partition,
    # but the re-run still validates C neighbors; mirror the CF_init=1
    # reset: unassigned (0) points go through PMIS rounds.
    cf_open = cf.copy()
    return pmis_coarsen(S, cf_init=cf_open, seed=seed)


def cr_coarsen(
    S_or_A,
    A: "sp.csr_matrix" = None,
    theta_cr: float = 0.7,
    mu: int = 5,
    omega: float = 1.0,
    relax: str = "gs",
    seed: int = 2747,
    max_stages: int = 20,
):
    """Compatible-relaxation coarsening (par_cr.c hypre_cr:72).

    Stages: run mu sweeps of F-point relaxation on the homogeneous
    system (C values pinned to 0), measure the asymptotic factor
    rho = ||e1||/||e0||; while rho > theta_cr, mark slow points
    (|e_i|/max > 1 - rho, par_cr.c hypre_formu:450) as candidates and
    promote a greedy independent set of them to C
    (hypre_IndepSetGreedy:179: measure = 1 + #candidate neighbors).
    F-point errors re-randomized each stage with the Park-Miller
    stream (1 + 0.1*rand).
    """
    import scipy.sparse as sp

    from ...utils.lcg import lcg_fill

    M = (A if A is not None else S_or_A).tocsr()
    n = M.shape[0]
    diag = M.diagonal()
    dsafe = np.where(diag == 0, 1.0, diag)
    Aoff = (M - sp.diags(diag)).tocsr()
    indptr, indices = M.indptr, M.indices
    row_nnz = np.diff(indptr)

    cf = np.full(n, F_PT, dtype=np.int64)
    skip = 0
    e1 = 1.0 + 0.1 * lcg_fill(seed, n, skip)
    skip += n
    e0 = np.zeros(n)

    for stage in range(max_stages):
        fmask = cf == F_PT
        e0[~fmask] = 0.0
        e1[~fmask] = 0.0
        if relax == "gs":
            # hypre_fptgscr (par_cr.c): TRUE forward Gauss-Seidel on the
            # F-point block — L_FF e1 = -U_FF e0 via a triangular solve
            import scipy.sparse.linalg as _spla

            fidx = np.flatnonzero(fmask)
            AFF = M[np.ix_(fidx, fidx)].tocsr()
            LFF = sp.tril(AFF, k=0).tocsr()
            UFF = sp.triu(AFF, k=1).tocsr()
        for _ in range(mu):
            e0[fmask] = e1[fmask]
            if relax == "gs":
                ef = _spla.spsolve_triangular(
                    LFF, -(UFF @ e0[fidx]), lower=True
                )
                e1 = np.zeros_like(e1)
                e1[fidx] = ef
            else:
                res = -(Aoff @ np.where(fmask, e0, 0.0))
                e1 = np.where(
                    fmask, (1 - omega) * e1 + omega * res / dsafe, 0.0
                )
        n0 = np.linalg.norm(e0)
        rho = np.linalg.norm(e1) / (n0 if n0 > 0 else 1.0)
        if rho <= theta_cr:
            break
        # candidate set
        emax = np.abs(e1).max() or 1.0
        cand = fmask & (np.abs(e1) / emax > (1.0 - rho)) & (row_nnz > 1)
        # greedy independent set by candidate-neighbor count
        cidx = np.flatnonzero(cand)
        if cidx.size == 0:
            break
        is_cand = cand.copy()
        measure = np.zeros(n, dtype=np.int64)
        for i in cidx:
            nbrs = indices[indptr[i] : indptr[i + 1]]
            measure[i] = 1 + int(is_cand[nbrs].sum())
        order = np.lexsort((np.arange(n)[cidx], -measure[cidx]))
        alive = is_cand.copy()
        for i in cidx[order]:
            if not alive[i]:
                continue
            cf[i] = C_PT
            alive[i] = False
            nbrs = indices[indptr[i] : indptr[i + 1]]
            alive[nbrs] = False
        # re-randomize F errors
        fmask = cf == F_PT
        nf = int(fmask.sum())
        fresh = 1.0 + 0.1 * lcg_fill(seed, nf, skip)
        skip += nf
        e0[fmask] = fresh
        e1[fmask] = 1.0 + 0.1 * lcg_fill(seed, nf, skip)
        skip += nf
    return cf
