"""AMG-DD: algebraic multigrid with domain-decomposed composite grids.

Reference: parcsr_ls/par_amgdd{,_setup,_solve,_comp_grid}*.c (~6 kLoC):
after a standard BoomerAMG setup, every processor extends its owned
rows AT EVERY LEVEL by a distance-`padding` ring (the composite grid,
par_amgdd_comp_grid.c); one residual communication per outer iteration
feeds independent LOCAL FAC-style V-cycles on each composite hierarchy
(par_amgdd_fac_cycle.c), eliminating the per-level communication of a
standard V-cycle — the communication-avoiding AMG for
latency-dominated machines.

TPU mapping: a "processor" is a mesh shard; the one residual exchange
per iteration is a single ICI collective instead of 2 x num_levels
halo exchanges.  This host implementation builds the per-domain
composite hierarchies and runs the exact owned/ghost-masked FAC cycles;
the sharded execution plugs into parallel/par_amg.py's mesh machinery.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from ...ops.csr import CSRMatrix
from ..krylov.common import SolverResult
from .boomeramg import BoomerAMG


@dataclasses.dataclass
class AMGDDOptions:
    num_domains: int = 4
    padding: int = 2  # graph-distance ring added per level
    fac_cycles: int = 2  # inner FAC V-cycles per outer iteration
    relax_weight: float = 0.8
    num_relax: int = 2


def _ring(A: sp.csr_matrix, seed_mask: np.ndarray, dist: int) -> np.ndarray:
    """Grow seed_mask by `dist` graph-distance rings of A's pattern."""
    m = seed_mask.copy()
    for _ in range(dist):
        m = m | (np.asarray(np.abs(A) @ m.astype(float)).ravel() > 0)
    return m


class AMGDD:
    """Composite-grid AMG-DD built on an existing BoomerAMG hierarchy."""

    def __init__(self, amg: BoomerAMG, opts: AMGDDOptions = AMGDDOptions()):
        self.amg = amg
        self.opts = opts
        self._setup()

    def _setup(self) -> None:
        o = self.opts
        As = self.amg._host_A
        Ps = [self.amg.host_P(l) for l in range(len(self.amg._host_P))] \
            if hasattr(self.amg, "host_P") else self.amg._host_P
        cfs = self.amg._cf
        L = len(As)
        n0 = As[0].shape[0]
        # contiguous fine-level ownership
        bounds = np.linspace(0, n0, o.num_domains + 1).astype(np.int64)
        self.domains = []
        for dom in range(o.num_domains):
            owned = [np.zeros(As[l].shape[0], bool) for l in range(L)]
            owned[0][bounds[dom]:bounds[dom + 1]] = True
            # ownership coarsens with the C points
            for l in range(L - 1):
                cmask = cfs[l] > 0
                owned[l + 1] = owned[l][cmask]
            comp = [
                _ring(As[l], owned[l], o.padding) for l in range(L)
            ]
            # per-level composite operators and transfers (ghost-zeroed)
            levels = []
            for l in range(L):
                idx = np.flatnonzero(comp[l])
                gl = -np.ones(As[l].shape[0], np.int64)
                gl[idx] = np.arange(len(idx))
                Al = As[l][np.ix_(idx, idx)].tocsr()
                dinv = Al.diagonal()
                dinv = np.where(dinv == 0, 0.0, 1.0 / np.where(dinv == 0, 1, dinv))
                entry = dict(
                    idx=idx, gl=gl, A=Al, dinv=dinv,
                    owned=owned[l][idx],
                )
                if l < L - 1:
                    idx_c = np.flatnonzero(comp[l + 1])
                    Pl = Ps[l][np.ix_(idx, idx_c)].tocsr()
                    entry["P"] = Pl
                levels.append(entry)
            # composite coarsest direct solve
            levels[-1]["inv"] = np.linalg.pinv(levels[-1]["A"].toarray())
            self.domains.append(levels)

    def _fac_vcycle(self, levels, l, u, f):
        o = self.opts
        lv = levels[l]
        if l == len(levels) - 1:
            return lv["inv"] @ f
        for _ in range(o.num_relax):
            u = u + o.relax_weight * lv["dinv"] * (f - lv["A"] @ u)
        r = f - lv["A"] @ u
        fc = lv["P"].T @ r
        ec = self._fac_vcycle(levels, l + 1, np.zeros_like(fc), fc)
        u = u + lv["P"] @ ec
        for _ in range(o.num_relax):
            u = u + o.relax_weight * lv["dinv"] * (f - lv["A"] @ u)
        return u

    def cycle(self, r: np.ndarray) -> np.ndarray:
        """One AMG-DD iteration: ONE global residual distribution, then
        independent composite-grid FAC cycles; owned corrections are
        stitched together (par_amgdd_solve.c)."""
        o = self.opts
        n0 = len(r)
        z = np.zeros(n0)
        for levels in self.domains:
            lv0 = levels[0]
            f = r[lv0["idx"]]
            u = np.zeros_like(f)
            for _ in range(o.fac_cycles):
                u = self._fac_vcycle(levels, 0, u, f)
            z[lv0["idx"][lv0["owned"]]] = u[lv0["owned"]]
        return z

    def solve(self, b, x0=None, tol=1e-8, max_iter=100) -> SolverResult:
        A = self.amg._host_A[0]
        x = np.zeros(len(b)) if x0 is None else np.asarray(x0)
        b = np.asarray(b)
        bn = np.linalg.norm(b) or 1.0
        norms = [np.linalg.norm(b - A @ x)]
        it = 0
        while it < max_iter and norms[-1] / bn >= tol:
            x = x + self.cycle(b - A @ x)
            norms.append(np.linalg.norm(b - A @ x))
            it += 1
        return SolverResult(
            x=x,
            num_iterations=it,
            rel_residual_norm=norms[-1] / bn,
            converged=norms[-1] / bn < tol,
            res_norms=np.array(norms),
        )


# ---------------------------------------------------------------------------
# Device/sharded execution (the communication-avoiding payoff path)
# ---------------------------------------------------------------------------

class AMGDDDevice:
    """Batched device execution of AMG-DD composite cycles.

    All domains' composite hierarchies are padded to common per-level
    shapes and stacked on a leading DOMAIN axis; one jitted call runs
    every domain's FAC V-cycles simultaneously (batched ELL matvecs,
    batched dense coarse solves on the MXU).  Communication structure is
    exactly par_amgdd_solve.c's: per outer iteration ONE distribution
    of the global residual into the composite grids and ONE gather of
    owned corrections — under a mesh (see `sharded_cycle`) the domain
    axis shards across devices and those two steps are the only
    collectives, versus 2 x num_levels halo exchanges for a standard
    distributed V-cycle.
    """

    def __init__(self, dd: AMGDD, dtype=np.float32):
        import jax
        import jax.numpy as jnp

        self.opts = dd.opts
        self.n0 = dd.amg._host_A[0].shape[0]
        D = len(dd.domains)
        L = len(dd.domains[0])
        self.num_levels = L
        levs = []
        for l in range(L):
            nmax = max(len(dom[l]["idx"]) for dom in dd.domains)
            w = max(
                int(np.diff(dom[l]["A"].indptr).max(initial=1))
                for dom in dd.domains
            )
            cols = np.zeros((D, nmax, w), np.int32)
            vals = np.zeros((D, nmax, w), dtype)
            dinv = np.zeros((D, nmax), dtype)
            owned = np.zeros((D, nmax), bool)
            for d, dom in enumerate(dd.domains):
                Al = dom[l]["A"].tocsr()
                nl = Al.shape[0]
                rn = np.diff(Al.indptr)
                r = np.repeat(np.arange(nl), rn)
                k = np.arange(Al.nnz) - np.repeat(Al.indptr[:-1], rn)
                cols[d, r, k] = Al.indices
                vals[d, r, k] = Al.data
                dinv[d, :nl] = dom[l]["dinv"]
                owned[d, :nl] = dom[l]["owned"]
            ent = dict(
                cols=jnp.asarray(cols), vals=jnp.asarray(vals),
                dinv=jnp.asarray(dinv), owned=jnp.asarray(owned),
            )
            if l < L - 1:
                ncmax = max(len(dom[l + 1]["idx"]) for dom in dd.domains)
                wp = max(
                    int(np.diff(dom[l]["P"].indptr).max(initial=1))
                    for dom in dd.domains
                )
                pc = np.zeros((D, nmax, wp), np.int32)
                pv = np.zeros((D, nmax, wp), dtype)
                # R = P^T stored as ELL too — width from the ACTUAL
                # transpose row widths (ADVICE r2: a hard-coded 64
                # overflowed for coarse points with >64 interpolants)
                wr = max(
                    int(np.diff(dom[l]["P"].T.tocsr().indptr).max(initial=1))
                    for dom in dd.domains
                )
                rc = np.zeros((D, ncmax, wr), np.int32)
                rv = np.zeros((D, ncmax, wr), dtype)
                for d, dom in enumerate(dd.domains):
                    Pl = dom[l]["P"].tocsr()
                    nl, nc = Pl.shape
                    rn = np.diff(Pl.indptr)
                    r = np.repeat(np.arange(nl), rn)
                    k = np.arange(Pl.nnz) - np.repeat(Pl.indptr[:-1], rn)
                    pc[d, r, k] = Pl.indices
                    pv[d, r, k] = Pl.data
                    Rl = Pl.T.tocsr()
                    rnR = np.diff(Rl.indptr)
                    rr = np.repeat(np.arange(nc), rnR)
                    kk = np.arange(Rl.nnz) - np.repeat(Rl.indptr[:-1], rnR)
                    rc[d, rr, kk] = Rl.indices
                    rv[d, rr, kk] = Rl.data
                ent["pcols"] = jnp.asarray(pc)
                ent["pvals"] = jnp.asarray(pv)
                ent["rcols"] = jnp.asarray(rc)
                ent["rvals"] = jnp.asarray(rv)
            else:
                nmaxL = nmax
                inv = np.zeros((D, nmaxL, nmaxL), dtype)
                for d, dom in enumerate(dd.domains):
                    nl = dom[l]["A"].shape[0]
                    inv[d, :nl, :nl] = dom[l]["inv"]
                ent["inv"] = jnp.asarray(inv)
            levs.append(ent)
        self.levels = levs

        # residual scatter / owned-correction gather index plans
        cmax0 = max(len(dom[0]["idx"]) for dom in dd.domains)
        gidx = np.full((D, cmax0), self.n0, np.int32)  # pad -> zero sink
        tgt = np.full((D, cmax0), self.n0, np.int32)
        for d, dom in enumerate(dd.domains):
            idx = dom[0]["idx"]
            gidx[d, :len(idx)] = idx
            own = dom[0]["owned"]
            tgt[d, :len(idx)] = np.where(own, idx, self.n0)
        self.gidx = jnp.asarray(gidx)
        self.tgt = jnp.asarray(tgt)
        self._cycle = jax.jit(self._cycle_impl)

    @staticmethod
    def _bell(cols, vals, u):
        import jax.numpy as jnp

        D, n, w = cols.shape
        ug = jnp.take_along_axis(u, cols.reshape(D, -1), axis=1).reshape(D, n, w)
        return jnp.sum(vals * ug, axis=-1)

    def _vcycle(self, l, u, f):
        import jax.numpy as jnp

        o = self.opts
        lv = self.levels[l]
        if l == self.num_levels - 1:
            return jnp.einsum("dij,dj->di", lv["inv"], f)
        for _ in range(o.num_relax):
            u = u + o.relax_weight * lv["dinv"] * (
                f - self._bell(lv["cols"], lv["vals"], u)
            )
        r = f - self._bell(lv["cols"], lv["vals"], u)
        fc = self._bell(lv["rcols"], lv["rvals"], r)
        ec = self._vcycle(l + 1, jnp.zeros_like(fc), fc)
        u = u + self._bell(lv["pcols"], lv["pvals"], ec)
        for _ in range(o.num_relax):
            u = u + o.relax_weight * lv["dinv"] * (
                f - self._bell(lv["cols"], lv["vals"], u)
            )
        return u

    def _cycle_impl(self, r):
        import jax.numpy as jnp

        o = self.opts
        rp = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
        f = rp[self.gidx]  # ONE residual distribution
        u = jnp.zeros_like(f)
        for _ in range(o.fac_cycles):
            u = self._vcycle(0, u, f)
        # ONE owned-correction gather (pad rows sink at n0)
        z = jnp.zeros(self.n0 + 1, r.dtype)
        z = z.at[self.tgt.reshape(-1)].set(u.reshape(-1))
        return z[: self.n0]

    def cycle(self, r):
        return self._cycle(r)

    @property
    def precond(self):
        return self.cycle
