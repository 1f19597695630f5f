"""ParaSails — sparse approximate inverse preconditioner.

Reference: distributed_ls/ParaSails/ (~8 kLoC): pattern from powers of a
thresholded matrix, least-squares rows; factored (FSAI) form for SPD
problems, unfactored for general.

TPU design: setup batches the per-row least-squares/Cholesky solves by
pattern size into dense [nrows_k, k, k] factorizations (host, vectorized
numpy); the apply is one (or two, factored) sparse matvecs through the
standard frozen formats — entirely gather/matmul, no triangular solves.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix
from ...ops.dia import freeze_auto, spmv


@dataclasses.dataclass(frozen=True)
class ParaSailsOptions:
    thresh: float = 0.1  # drop |a_ij| < thresh*sqrt(a_ii a_jj)
    nlevels: int = 1  # pattern = (sparsified A)^(nlevels+1) rows
    filter: float = 0.05  # post-filter small M entries
    symmetric: bool = True  # factored FSAI (SPD) vs unfactored


class ParaSails:
    def __init__(self, A: CSRMatrix, opts: ParaSailsOptions = ParaSailsOptions()):
        self.opts = opts
        As = A.to_scipy().tocsr()
        n = As.shape[0]

        # sparsified pattern matrix (Matrix.c threshold rule)
        d = np.sqrt(np.abs(As.diagonal()))
        d[d == 0] = 1.0
        Ac = As.tocoo()
        keep = np.abs(Ac.data) >= opts.thresh * d[Ac.row] * d[Ac.col]
        S = sp.coo_matrix(
            (np.ones(int(keep.sum())), (Ac.row[keep], Ac.col[keep])), shape=As.shape
        ).tocsr()
        P = S.copy()
        for _ in range(opts.nlevels):
            P = ((P @ S) > 0).astype(np.float64).tocsr()
        P = (P + sp.eye(n, format="csr")).tocsr()

        if opts.symmetric:
            G = self._fsai(As, P)
            self._G = freeze_auto(CSRMatrix.from_scipy(G))
            self._GT = freeze_auto(CSRMatrix.from_scipy(G.T.tocsr()))
            self._M = None
        else:
            M = self._spai(As, P)
            self._M = freeze_auto(CSRMatrix.from_scipy(M))
            self._G = self._GT = None

    @staticmethod
    def _fsai(As: sp.csr_matrix, P: sp.csr_matrix) -> sp.csr_matrix:
        """Factored sparse approximate inverse: per row i solve
        A[J,J] y = e_i over J = lower-pattern(i), normalize so that
        G A G^T ~ I.

        Vectorized: rows are grouped by pattern size k and each group is
        one batched [m, k, k] dense solve (LAPACK over the leading axis);
        the A[J,J] blocks come from one searchsorted into the CSR's
        (row*n + col) key array — no per-row python work.  (Round 1 ran
        an O(n) python loop with scipy lil lookups.)"""
        n = As.shape[0]
        As = As.tocsr()
        As.sort_indices()
        Pl = sp.tril(P).tocsr()

        # entry lookup: sorted 64-bit keys row*n + col
        rows64 = np.repeat(np.arange(n, dtype=np.int64), np.diff(As.indptr))
        keys = rows64 * n + As.indices
        data = As.data

        def lookup(q):
            pos = np.searchsorted(keys, q.ravel())
            pos = np.clip(pos, 0, max(len(keys) - 1, 0))
            hit = keys[pos] == q.ravel()
            out = np.where(hit, data[pos], 0.0)
            return out.reshape(q.shape)

        # per-row patterns J (lower triangle incl. diagonal, sorted)
        Jlists = []
        ks = np.zeros(n, dtype=np.int64)
        for i in range(n):
            J = Pl.indices[Pl.indptr[i]: Pl.indptr[i + 1]]
            J = np.sort(J[J <= i])
            if J.size == 0 or J[-1] != i:
                J = np.append(J, i)
            Jlists.append(J)
            ks[i] = len(J)

        rows_l, cols_l, vals_l = [], [], []
        for k in np.unique(ks):
            ridx = np.flatnonzero(ks == k)
            Jmat = np.stack([Jlists[i] for i in ridx])  # [m, k]
            Q = Jmat[:, :, None] * n + Jmat[:, None, :]
            blk = lookup(Q)  # [m, k, k]
            e = np.zeros((len(ridx), k))
            e[:, -1] = 1.0
            try:
                y = np.linalg.solve(blk, e[..., None])[..., 0]
            except np.linalg.LinAlgError:
                y = np.stack([
                    np.linalg.lstsq(blk[t], e[t], rcond=None)[0]
                    for t in range(len(ridx))
                ])
            bad = ~np.isfinite(y).all(axis=1)
            for t in np.flatnonzero(bad):
                y[t] = np.linalg.lstsq(blk[t], e[t], rcond=None)[0]
            piv = y[:, -1]
            scale = np.where(
                piv != 0, 1.0 / np.sqrt(np.abs(np.where(piv == 0, 1, piv))), 1.0
            )
            rows_l.append(np.repeat(ridx, k))
            cols_l.append(Jmat.ravel())
            vals_l.append((y * scale[:, None]).ravel())
        G = sp.coo_matrix(
            (np.concatenate(vals_l), (np.concatenate(rows_l), np.concatenate(cols_l))),
            shape=As.shape,
        ).tocsr()
        return G

    @staticmethod
    def _spai(As: sp.csr_matrix, P: sp.csr_matrix) -> sp.csr_matrix:
        """Unfactored SPAI: per row minimize ||e_i - m_i A|| over pattern."""
        n = As.shape[0]
        AT = As.T.tocsr()
        rows_l, cols_l, vals_l = [], [], []
        for i in range(n):
            J = P.indices[P.indptr[i] : P.indptr[i + 1]]
            # columns of A touched by rows J
            sub = AT[:, J]  # [n, k] sparse — restrict to nonzero rows
            I = np.unique(sub.tocoo().row)
            B = np.asarray(As[np.ix_(J, I)].todense())  # [k, |I|]
            e = np.zeros(len(I))
            e[np.searchsorted(I, i)] = 1.0
            m = np.linalg.lstsq(B.T, e, rcond=None)[0]
            rows_l.append(np.full(len(J), i))
            cols_l.append(J)
            vals_l.append(m)
        return sp.coo_matrix(
            (np.concatenate(vals_l), (np.concatenate(rows_l), np.concatenate(cols_l))),
            shape=As.shape,
        ).tocsr()

    def solve(self, r):
        """Apply M^{-1}: factored G^T G r, unfactored M r."""
        if self._G is not None:
            return spmv(self._GT, spmv(self._G, r))
        return spmv(self._M, r)

    @property
    def precond(self):
        return self.solve


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParaSailsData:
    """Pytree form of the sparse-approximate-inverse apply — the
    BoomerAMG smooth_type 8 level smoother (par_cycle.c: levels below
    smooth_num_levels call HYPRE_ParaSailsSolve instead of
    relaxation).  Factored (G^T G) when symmetric, else M."""

    G: object = None
    GT: object = None
    M: object = None


def build_parasails_data(A: CSRMatrix,
                         opts: ParaSailsOptions = ParaSailsOptions()):
    ps = ParaSails(A, opts)
    return ParaSailsData(G=ps._G, GT=ps._GT, M=ps._M)


def parasails_apply(pd: ParaSailsData, r):
    if pd.G is not None:
        return spmv(pd.GT, spmv(pd.G, r))
    return spmv(pd.M, r)


def parasails_smooth(pd: ParaSailsData, matvec, u, f, weight=1.0):
    """u += w * M^{-1} (f - A u) — one ParaSails smoothing sweep."""
    return u + weight * parasails_apply(pd, f - matvec(u))
