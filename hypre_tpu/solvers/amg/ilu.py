"""ILU factorization preconditioners/smoothers.

Reference: parcsr_ls/par_ilu{,_setup,_solve}.c (~16 kLoC): ILU(0)/ILUK/
ILUT factorizations with (block-Jacobi across ranks) triangular solves;
the VE fork's level-scheduled substitution applies to the sweeps.

TPU design: factorization happens host-side (scipy/numpy — setup phase);
the triangular solves run on device via the same wavefront schedules the
GS smoother uses (relax.py GSSchedule): L-solve = forward schedule of L,
U-solve = backward schedule of U — each level a batched gather/scatter.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix
from .relax import GSSchedule, build_gs_schedule, gauss_seidel
from ...utils.errors import generic_error


@dataclasses.dataclass(frozen=True)
class ILUOptions:
    type: int = 0  # 0 = ILU(k) (fill_level; k=0 default); 1 = ILUT
    fill_level: int = 0  # ILU(k) level of fill (hypre ilu_lfil)
    droptol: float = 0.01  # ILUT drop tolerance (ilu_droptol default)
    max_row_nnz: int = 20  # ILUT fill cap (ilu_max_row_nnz default)


def ilu0_factor(A: sp.csr_matrix):
    """IKJ-variant ILU(0): L (unit lower) and U with A's sparsity."""
    A = A.tocsr().copy()
    A.sort_indices()
    n = A.shape[0]
    indptr, indices, data = A.indptr, A.indices, A.data.astype(np.float64).copy()
    diag_pos = np.zeros(n, dtype=np.int64)
    for i in range(n):
        row = indices[indptr[i] : indptr[i + 1]]
        dp = np.searchsorted(row, i)
        diag_pos[i] = indptr[i] + dp

    # standard in-place IKJ ILU(0)
    col_pos = {}
    for i in range(n):
        s, e = indptr[i], indptr[i + 1]
        row_cols = indices[s:e]
        col_pos.clear()
        for p in range(s, e):
            col_pos[indices[p]] = p
        for p in range(s, e):
            k = indices[p]
            if k >= i:
                break
            dk = data[diag_pos[k]]
            if dk == 0:
                continue
            lik = data[p] / dk
            data[p] = lik
            for q in range(diag_pos[k] + 1, indptr[k + 1]):
                j = indices[q]
                pj = col_pos.get(j)
                if pj is not None:
                    data[pj] -= lik * data[q]

    M = sp.csr_matrix((data, indices.copy(), indptr.copy()), shape=A.shape)
    L = sp.tril(M, k=-1).tocsr() + sp.eye(n, format="csr")
    U = sp.triu(M, k=0).tocsr()
    return L.tocsr(), U.tocsr()


def iluk_factor(A: sp.csr_matrix, fill: int):
    """ILU(k) with level-of-fill via the native row-merge kernel (the
    Euclid ilu_mpi_pilu.c role — no external factorization library)."""
    from ... import native

    A = A.tocsr()
    A.sort_indices()
    n = A.shape[0]
    out = native.iluk_factor(A.indptr, A.indices, A.data, n, fill)
    if out is None:  # no C compiler: ILU(0) python fallback only
        if fill == 0:
            return ilu0_factor(A)
        raise generic_error("ILU(k>0) requires the native kernel")
    (lp, li, lx), (up, ui, ux) = out
    L = sp.csr_matrix((lx, li, lp), shape=(n, n)) + sp.eye(n, format="csr")
    U = sp.csr_matrix((ux, ui, up), shape=(n, n))
    L.sort_indices()
    U.sort_indices()
    return L.tocsr(), U.tocsr()


def ilut_factor(A: sp.csr_matrix, droptol=0.01, max_row_nnz=20):
    """Dual-threshold ILUT (Saad) via the native row-merge kernel
    (par_ilu_setup.c hypre_ILUSetupILUT role).  Falls back to scipy's
    spilu (SuperLU ILUTP) only when no C compiler exists."""
    A = A.tocsr()
    A.sort_indices()
    n = A.shape[0]
    from ... import native

    out = native.ilut_factor(
        A.indptr, A.indices, A.data, n, droptol, max_row_nnz
    )
    if out is not None:
        (lp, li, lx), (up, ui, ux) = out
        L = sp.csr_matrix((lx, li, lp), shape=(n, n)) + sp.eye(n, format="csr")
        U = sp.csr_matrix((ux, ui, up), shape=(n, n))
        L.sort_indices()
        U.sort_indices()
        return L.tocsr(), U.tocsr(), None, None

    import scipy.sparse.linalg as spla  # pragma: no cover - fallback

    B = spla.spilu(
        A.tocsc(), drop_tol=droptol, fill_factor=max(1, max_row_nnz // 2)
    )
    return B.L.tocsr(), B.U.tocsr(), B.perm_r, B.perm_c


class ILU:
    """M^{-1} r = U^{-1} L^{-1} r via wavefront-scheduled substitution."""

    def __init__(self, A: CSRMatrix, opts: ILUOptions = ILUOptions()):
        self.opts = opts
        As = A.to_scipy()
        self.perm_r = self.perm_c = None
        if opts.type == 0:
            if opts.fill_level == 0:
                L, U = ilu0_factor(As)
            else:
                L, U = iluk_factor(As, opts.fill_level)
        else:
            L, U, self.perm_r, self.perm_c = ilut_factor(
                As, opts.droptol, opts.max_row_nnz
            )
        # forward schedule solves L y = r (unit diag -> divisor 1),
        # backward solves U x = y
        Lc = CSRMatrix.from_scipy(L)
        Uc = CSRMatrix.from_scipy(U)
        self._Lsched = build_gs_schedule(
            Lc, forward=True, divisor=np.ones(L.shape[0])
        )
        self._Usched = build_gs_schedule(Uc, forward=False, divisor=U.diagonal())
        if self.perm_r is not None:
            self._pr = jnp.asarray(np.asarray(self.perm_r))
            self._pc = jnp.asarray(np.asarray(self.perm_c))

    def solve(self, r):
        """Apply the preconditioner (the hypre_ILUSolve triangular pair)."""
        if self.perm_r is not None:
            r = r[self._pr]
        y = gauss_seidel(self._Lsched, jnp.zeros_like(r), r)
        x = gauss_seidel(self._Usched, jnp.zeros_like(y), y)
        if self.perm_c is not None:
            x = jnp.zeros_like(x).at[self._pc].set(x)
        return x

    @property
    def precond(self):
        return self.solve


# ---------------------------------------------------------------------------
# Schur-complement ILU (the PILUT / par_ilu GMRES-Schur pipeline role)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SchurILUOptions:
    num_domains: int = 4
    fill_level: int = 0      # ILU(k) level for the interior blocks
    schur_tol: float = 1e-2  # inner GMRES tolerance on the Schur system
    schur_max_iter: int = 20
    schur_kdim: int = 20


class SchurILU:
    """Two-level Schur-complement ILU preconditioner.

    Reference: distributed_ls/pilut/ (Saad's parallel ILUT: factor each
    domain's INTERIOR independently, reduce the interface unknowns to a
    Schur complement solved iteratively) and parcsr_ls/par_ilu's
    GMRES-in-Schur variants.

    Rows partition into contiguous domains; interior = rows whose
    couplings stay inside their domain, interface = the rest.  With
    A = [[B, F], [E, C]] (interior, interface):
        M^{-1} r solves  B y_B = r_B  (per-domain ILU(k) triangular
        solves — embarrassingly parallel), then the Schur system
        (C - E B^{-1} F) y_S = r_S - E y_B  by inner GMRES with the
        exact-action Schur operator (each apply = one interior ILU
        solve), then back-substitutes y_B -= B^{-1} F y_S.
    """

    def __init__(self, A: CSRMatrix, opts: SchurILUOptions = SchurILUOptions()):
        import jax.numpy as jnp

        self.opts = opts
        As = A.to_scipy().tocsr()
        n = As.shape[0]
        D = opts.num_domains
        bounds = np.linspace(0, n, D + 1).astype(np.int64)
        dom = np.searchsorted(bounds[1:], np.arange(n), side="right")
        # interface rows: any coupling crossing a domain boundary
        Ac = As.tocoo()
        cross = dom[Ac.row] != dom[Ac.col]
        iface = np.zeros(n, bool)
        iface[Ac.row[cross]] = True
        iface[Ac.col[cross]] = True
        self.int_idx = np.flatnonzero(~iface)
        self.ifc_idx = np.flatnonzero(iface)
        perm = np.concatenate([self.int_idx, self.ifc_idx])
        self._perm = perm
        self._iperm = np.argsort(perm)
        ni = len(self.int_idx)
        self.ni = ni
        Ap = As[perm][:, perm].tocsr()
        B = Ap[:ni, :ni].tocsr()
        from ...ops.dia import freeze_auto as _freeze

        # device (jittable) forms of the off-blocks and interface block
        self.F = _freeze(CSRMatrix.from_scipy(Ap[:ni, ni:].tocsr()))
        self.E = _freeze(CSRMatrix.from_scipy(Ap[ni:, :ni].tocsr()))
        self.C = _freeze(CSRMatrix.from_scipy(Ap[ni:, ni:].tocsr()))
        # interior ILU(k): B is block-diagonal by domain, so one global
        # factorization IS the per-domain factorization (no cross fill)
        self._Bilu = ILU(
            CSRMatrix.from_scipy(B),
            ILUOptions(type=0, fill_level=opts.fill_level),
        )
        # Schur preconditioner: ILU(0) of C
        self._Cilu = ILU(
            CSRMatrix.from_scipy(Ap[ni:, ni:].tocsr()), ILUOptions(type=0)
        )
        self._perm_dev = jnp.asarray(self._perm.astype(np.int32))
        self._iperm_dev = jnp.asarray(self._iperm.astype(np.int32))

    def _Binv(self, r):
        return self._Bilu.solve(r)

    def _schur_op(self, y):
        from ...ops.dia import spmv as _spmv

        t = self._Binv(_spmv(self.F, y))
        return _spmv(self.C, y) - _spmv(self.E, t)

    def solve(self, r):
        """Apply the two-level preconditioner (host-orchestrated;
        the triangular kernels run on device)."""
        import jax.numpy as jnp

        from ..krylov import GMRESOptions, gmres

        from ...ops.dia import spmv as _spmv

        o = self.opts
        rp = jnp.asarray(r)[self._perm_dev]
        rB = rp[: self.ni]
        rS = rp[self.ni:]
        yB = self._Binv(rB)
        g = rS - _spmv(self.E, yB)
        res = gmres(
            self._schur_op, g, M=self._Cilu.solve,
            opts=GMRESOptions(tol=o.schur_tol, max_iter=o.schur_max_iter,
                              k_dim=o.schur_kdim),
        )
        yS = res.x
        yB = yB - self._Binv(_spmv(self.F, yS))
        return jnp.concatenate([yB, yS])[self._iperm_dev]

    @property
    def precond(self):
        return self.solve
