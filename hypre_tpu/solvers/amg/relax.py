"""Smoothers (device, jittable).

Reference: parcsr_ls/par_relax.c hypre_BoomerAMGRelax (:109-137 dispatch):
  0   weighted Jacobi (CF variant = relax_points +-1)
  7   Jacobi via matvec
  3/4 hybrid forward/backward SOR-GS     (np=1, 1 thread -> true GS)
  6   hybrid symmetric SSOR-GS
  13/14 L1-GS forward/backward           (np=1, 1 thread -> GS with the
        option-4 l1 norm, which degenerates to |a_ii|, ams.c:569-660)
  18  L1-Jacobi
  16  Chebyshev (par_cheby.c)

TPU design: Jacobi-family smoothers are single fused SpMV+axpy kernels.
Gauss-Seidel is inherently sequential; following the VE fork's
level-scheduled substitution (par_relax.c:472-560: levels of the
triangular dependency DAG, ASL-sorted), we precompute wavefront levels
host-side and run one lax.scan step per level — each level is a batched
gather/updatee with static shapes.  This gives bit-faithful sequential-GS
math (iteration-count parity with np=1 hypre) at the cost of O(#levels)
kernel steps; for large grids prefer l1-Jacobi/Chebyshev (hypre's own
guidance for massive parallelism).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.csr import CSRMatrix, ELLMatrix
from ...ops.spmv import ell_spmv
from ...ops.dia import spmv


# ---------------------------------------------------------------------------
# Jacobi family
# ---------------------------------------------------------------------------

def jacobi(A, dinv, u, f, weight=1.0):
    """u += weight * D^{-1} (f - A u)   (par_relax.c case 0, all points)."""
    with jax.named_scope("RELAX"):
        r = f - spmv(A, u)
        return u + weight * dinv * r


def jacobi_cf(A, dinv, u, f, mask, weight=1.0):
    """CF-Jacobi: update only rows where mask (C then F gives CF-GS)."""
    with jax.named_scope("RELAX"):
        r = f - spmv(A, u)
        return jnp.where(mask, u + weight * dinv * r, u)


def l1_jacobi(A, l1inv, u, f, weight=1.0):
    """relax 18: u += (f - A u) / l1   (par_relax.c:3492 family)."""
    return jacobi(A, l1inv, u, f, weight)


# ---------------------------------------------------------------------------
# Level-scheduled Gauss-Seidel
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GSSchedule:
    """Wavefront schedule: rows grouped into dependency levels.

    rows[l, k] = row index of k-th row in level l, or n (sentinel pad).
    The gathered ELL slabs (acols/adata) are prefetched per level so the
    scan step is gather(u) -> reduce -> scatter(u).
    """

    rows: jax.Array  # int32 [L, W]
    acols: jax.Array  # int32 [L, W, width]
    adata: jax.Array  # real [L, W, width]
    dinv: jax.Array  # real [L, W]   (1/divisor, 0 at pads)
    n: int = dataclasses.field(metadata=dict(static=True))


def build_gs_schedule(
    A: CSRMatrix,
    forward: bool = True,
    divisor: np.ndarray | None = None,
    mask: np.ndarray | None = None,
) -> GSSchedule:
    """Host: compute wavefront levels of the (lower/upper) triangular
    dependency DAG (the par_relax.c:472-560 analog) and pack per-level
    ELL slabs.  With `mask` (CF-ordered GS, par_cycle.c:398 relax_order
    sweeps), only mask rows are updated and only mask-row dependencies
    order the wavefronts — non-mask values are constants for the sweep."""
    n = A.num_rows
    indptr, indices = A.indptr, A.indices
    from ... import native

    level = None
    if mask is None:
        level = native.gs_levels(indptr, indices, n, forward)
    if level is None:  # masked, or no compiler: pure-python fallback
        inmask = np.ones(n, bool) if mask is None else np.asarray(mask, bool)
        level = np.full(n, -1, dtype=np.int64)
        order = range(n) if forward else range(n - 1, -1, -1)
        for i in order:
            if not inmask[i]:
                continue
            cols = indices[indptr[i] : indptr[i + 1]]
            deps = cols[cols < i] if forward else cols[cols > i]
            deps = deps[inmask[deps]] if mask is not None else deps
            lv = level[deps]
            lv = lv[lv >= 0]
            level[i] = lv.max() + 1 if lv.size else 0
        if mask is not None:
            nlev = int(level.max()) + 1 if (level >= 0).any() else 1
            buckets = [np.flatnonzero(level == l) for l in range(nlev)]
            return _pack_gs(A, buckets, divisor)

    nlev = int(level.max()) + 1 if n else 1
    buckets = [np.flatnonzero(level == l) for l in range(nlev)]
    return _pack_gs(A, buckets, divisor)


def _pack_gs(A: CSRMatrix, buckets, divisor):
    n = A.num_rows
    nlev = len(buckets)
    W = max((len(b) for b in buckets), default=1) or 1
    # host row-major (rows are indexed below)
    E = A.to_ell(device=False, transposed=False)
    cols_h = np.asarray(E.cols)
    data_h = np.asarray(E.data)
    width = E.width
    div = divisor if divisor is not None else A.diagonal()

    rows = np.full((nlev, W), n, dtype=np.int32)
    acols = np.zeros((nlev, W, width), dtype=np.int32)
    adata = np.zeros((nlev, W, width), dtype=data_h.dtype)
    dinv = np.zeros((nlev, W), dtype=data_h.dtype)
    for l, b in enumerate(buckets):
        rows[l, : len(b)] = b
        acols[l, : len(b)] = cols_h[b]
        adata[l, : len(b)] = data_h[b]
        dinv[l, : len(b)] = np.where(div[b] != 0, 1.0 / np.where(div[b] == 0, 1, div[b]), 0.0)

    return GSSchedule(
        rows=jnp.asarray(rows),
        acols=jnp.asarray(acols),
        adata=jnp.asarray(adata),
        dinv=jnp.asarray(dinv),
        n=n,
    )


def gauss_seidel(sched: GSSchedule, u, f, weight=1.0, omega=1.0, v=None):
    """One sweep in the schedule's direction; exact sequential-GS math.

    `omega` is hypre's outer SOR weight (par_relax.c:1277
    ``prod = 1 - relax_weight*omega`` recurrence).  Expanding the
    reference update
    ``u_i = prod*u_i + w*(omega*f_i + res0 + (1-omega)*res2)/a_ii``
    with full row sums S (diagonal included), the a_ii terms collapse
    to ``u_i += w*((1-omega)*(u_i - v_i)
    + dinv_i*(omega*f_i - S_cur + (1-omega)*S_pre))`` — with v == u
    (a single sweep) the first term vanishes and omega == 1 recovers
    the plain weighted sweep bitwise.  `v` is the pre-CALL iterate
    defining S_pre: hypre copies Vtemp once per Relax call
    (par_relax.c:3148), so SSOR's backward half reuses the forward
    half's v; defaults to u (a plain single sweep)."""
    n = sched.n
    u_ext = jnp.concatenate([u, jnp.zeros(1, u.dtype)])
    f_ext = jnp.concatenate([f, jnp.zeros(1, f.dtype)])
    plain = isinstance(omega, float) and omega == 1.0
    v_ext = (u_ext if v is None or plain
             else jnp.concatenate([v, jnp.zeros(1, v.dtype)]))

    def step(u_ext, slab):
        rows, acols, adata, dinv = slab
        if plain:
            r = f_ext[rows] - jnp.sum(adata * u_ext[acols], axis=-1)
            u_ext = u_ext.at[rows].add(weight * dinv * r)
        else:
            s_cur = jnp.sum(adata * u_ext[acols], axis=-1)
            s_pre = jnp.sum(adata * v_ext[acols], axis=-1)
            r = omega * f_ext[rows] - s_cur + (1.0 - omega) * s_pre
            # zero-diagonal rows are skipped by the reference
            # (a_ii != 0 guard) — dinv == 0 marks them and the pads
            upd = weight * ((1.0 - omega) * (u_ext[rows] - v_ext[rows])
                            + dinv * r)
            u_ext = u_ext.at[rows].add(jnp.where(dinv != 0, upd, 0.0))
        return u_ext, None

    with jax.named_scope("RELAX"):
        u_ext, _ = jax.lax.scan(
            step, u_ext, (sched.rows, sched.acols, sched.adata, sched.dinv)
        )
    return u_ext[:n]


# ---------------------------------------------------------------------------
# Chebyshev (relax 16)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ChebyData:
    coefs: jax.Array  # [order+1]
    dsqrtinv: jax.Array  # D^{-1/2} (scaled variant)
    order: int = dataclasses.field(metadata=dict(static=True))


def cheby_setup(
    A: CSRMatrix,
    order: int = 2,
    ratio: float = 0.3,
    max_eig: float | None = None,
    min_eig: float | None = None,
    eig_est_iters: int = 10,
) -> ChebyData:
    """Coefficients of the scaled Chebyshev smoother, matching
    hypre_ParCSRRelax_Cheby_Setup (par_cheby.c):
      upper = 1.1 * max_eig;  lower = (upper - min_eig)*fraction + min_eig
      theta = (upper+lower)/2, delta = (upper-lower)/2
      standard-variant monomial coefficients for cheby_order = order-1
    Eigen bounds from the exact hypre_ParCSRMaxEigEstimateCG replica
    (max_eig_estimate_cg above; cheby_eig_est=10, cheby_scale=1
    defaults — par_amg_setup.c's call for relax 16).
    """
    diag = A.diagonal()
    dsqrtinv = 1.0 / np.sqrt(np.abs(diag))
    if max_eig is None or min_eig is None:
        hi, lo = max_eig_estimate_cg(
            A, scale=True, max_iter=max(eig_est_iters, 3)
        )
        max_eig = hi if max_eig is None else max_eig
        min_eig = max(lo, 0.0) if min_eig is None else min_eig

    upper = max_eig * 1.1
    lower = (upper - min_eig) * ratio + min_eig
    theta = (upper + lower) / 2
    delta = (upper - lower) / 2

    order = min(max(order, 1), 4)
    coefs = _cheby_std_coefs(order, theta, delta)
    return ChebyData(
        coefs=jnp.asarray(coefs),
        dsqrtinv=jnp.asarray(dsqrtinv),
        order=order,
    )


def max_eig_estimate_cg(A: CSRMatrix, scale: bool = True,
                        max_iter: int = 10):
    """hypre_ParCSRMaxEigEstimateCG (par_relax_more.c:115-390), exact
    arithmetic replica: r = SetRandomValues(seed 1) via the bit-exact
    hypre LCG (utils/lcg.py), the unpreconditioned CG recurrence
    (s = C*r with C = I — the reference's own TODO leaves diagonal
    preconditioning unimplemented), the tridiag/trioffd fill with
    beta-rescaling, and the tridiagonal eigensolve (LINPACK cgtql1
    there, LAPACK here — same matrix, agreement to roundoff).
    scale: estimate on D^{-1/2} A D^{-1/2} (relax 16 / cheby_scale=1).
    Returns (max_eig, min_eig)."""
    from ...utils.lcg import lcg_fill

    M = A.to_scipy().tocsr()
    n = A.num_rows
    max_iter = min(max_iter, n)
    r = 2.0 * lcg_fill(1, n) - 1.0
    ds = 1.0 / np.sqrt(M.diagonal()) if scale else np.ones(n)
    tridiag = np.zeros(max_iter + 1)
    trioffd = np.zeros(max_iter + 1)
    gamma = 0.0
    p = np.zeros(n)
    for i in range(max_iter):
        s = r.copy()
        gamma_old = gamma
        gamma = float(r @ s)
        if i == 0:
            beta = 1.0
            p = s.copy()
        else:
            beta = gamma / gamma_old
            p = s + beta * p
        if scale:
            s = ds * (M @ (ds * p))
        else:
            s = M @ p
        sdotp = float(s @ p)
        alpha = gamma / sdotp
        alphainv = 1.0 / alpha
        tridiag[i + 1] = alphainv
        tridiag[i] = tridiag[i] * beta + alphainv
        trioffd[i + 1] = alphainv
        trioffd[i] *= np.sqrt(beta)
        r = r - alpha * s
    T = np.diag(tridiag[:max_iter])
    for j in range(max_iter - 1):
        T[j, j + 1] = T[j + 1, j] = trioffd[j + 1]
    ev = np.linalg.eigvalsh(T)
    return float(ev[-1]), float(ev[0])


def _lanczos_bounds(mv, n, iters=10, seed=0):
    """Ritz extreme estimates from a short Lanczos recurrence."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    alphas, betas = [], []
    v_prev = np.zeros(n)
    beta = 0.0
    for _ in range(min(iters, n)):
        w = mv(v) - beta * v_prev
        alpha = float(v @ w)
        w -= alpha * v
        beta = float(np.linalg.norm(w))
        alphas.append(alpha)
        betas.append(beta)
        if beta < 1e-14:
            break
        v_prev = v
        v = w / beta
    k = len(alphas)
    T = np.diag(alphas)
    for j in range(k - 1):
        T[j, j + 1] = T[j + 1, j] = betas[j]
    ev = np.linalg.eigvalsh(T)
    return float(ev[0]), float(ev[-1])


def _power_iter(mv, n, iters=30, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    lam = 1.0
    for _ in range(iters):
        y = mv(x)
        lam = np.linalg.norm(y)
        if lam == 0:
            return 1.0
        x = y / lam
    return float(lam)


def _cheby_std_coefs(order, theta, delta):
    """hypre's standard-variant monomial coefficients (par_cheby.c,
    cheby_order = order-1 cases 0..3, copied formulas 1:1)."""
    th, de = theta, delta
    co = order - 1
    if co == 0:
        return np.array([1.0 / th])
    if co == 1:
        den = de * de - 2 * th * th
        return np.array([-4 * th / den, 2 / den])
    if co == 2:
        den = 3 * de * de * th - 4 * th**3
        return np.array(
            [(3 * de * de - 12 * th * th) / den, 12 * th / den, -4 / den]
        )
    den = de**4 - 8 * de * de * th * th + 8 * th**4
    return np.array([
        (32 * th**3 - 16 * de * de * th) / den,
        (8 * de * de - 48 * th * th) / den,
        32 * th / den,
        -8 / den,
    ])


def chebyshev(A, cd: ChebyData, u, f):
    """u += D^{-1/2} p(As) D^{-1/2} r with As = D^{-1/2} A D^{-1/2}."""
    with jax.named_scope("RELAX"):
        ds = cd.dsqrtinv
        r = ds * (f - spmv(A, u))
        # Horner on the scaled operator
        acc = cd.coefs[cd.order - 1] * r
        for k in range(cd.order - 2, -1, -1):
            acc = cd.coefs[k] * r + ds * spmv(A, ds * acc)
        return u + ds * acc
