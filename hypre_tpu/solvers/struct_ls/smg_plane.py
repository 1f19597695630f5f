"""Batched 2-D SMG — the recursive plane solver under 3-D SMG.

Reference: struct_ls/smg_relax.c — hypre's 3-D SMG relaxation solves
each cdir-plane with a recursive (d-1)-dimensional SMG (one V-cycle per
relax), whose own relaxation solves lines exactly (cyclic reduction,
struct_ls/cyclic_reduction.c).  Round 1 replaced this with per-plane
dense inverses, which cap out at 4096-point planes.

TPU design: ALL planes of a level are solved together — every 2-D SMG
level is a batched [B, n2, n1] stencil problem (B = number of planes),
relaxed by parity line block-GS whose line systems are solved exactly
with parallel cyclic reduction along the minor axis (vectorized over
B x n2 lines at once).  Interpolation weights come from the same line
solves; coarse 2-D operators are exact Galerkin RAPs assembled per
plane on host at setup.  One V-cycle per plane solve mirrors hypre's
inexact recursion; setup weight solves use a few cycles.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from .cyclic_reduction import pcr_solve_batched


def _thomas_host(lower, diag, upper, rhs):
    """Vectorized-batch host tridiagonal solve along the last axis."""
    n = rhs.shape[-1]
    c = np.zeros_like(rhs)
    d = np.zeros_like(rhs)
    safe = lambda x: np.where(x == 0, 1.0, x)
    c[..., 0] = upper[..., 0] / safe(diag[..., 0])
    d[..., 0] = rhs[..., 0] / safe(diag[..., 0])
    for i in range(1, n):
        den = safe(diag[..., i] - lower[..., i] * c[..., i - 1])
        if i < n - 1:
            c[..., i] = upper[..., i] / den
        d[..., i] = (rhs[..., i] - lower[..., i] * d[..., i - 1]) / den
    x = np.zeros_like(rhs)
    x[..., -1] = d[..., -1]
    for i in range(n - 2, -1, -1):
        x[..., i] = d[..., i] - c[..., i] * x[..., i + 1]
    return x


def _apply2d(entries, x):
    """Batched 2-D stencil matvec: entries {(d2, d1): [B, n2, n1]},
    x [B, n2, n1]; out-of-grid neighbors are zero (Dirichlet drop)."""
    B, n2, n1 = x.shape
    acc = None
    for (d2, d1), c in entries.items():
        xp = x
        # shift x by (d2, d1) with zero fill: y[i] += c[i] * x[i + d]
        pad2 = (max(0, -d2), max(0, d2))
        pad1 = (max(0, -d1), max(0, d1))
        xp = jnp.pad(x, ((0, 0), pad2, pad1))
        xp = xp[:, pad2[1]: pad2[1] + n2, pad1[1]: pad1[1] + n1]
        t = c * xp
        acc = t if acc is None else acc + t
    return acc


def _line_bands(entries_np):
    """lower/diag/upper of the in-line (d2 == 0) systems."""
    some = next(iter(entries_np.values()))
    z = np.zeros_like(some)
    lo = entries_np.get((0, -1), z)
    di = entries_np.get((0, 0), z)
    up = entries_np.get((0, 1), z)
    return lo, di, up


def _host_entries(entries):
    return {k: np.asarray(v) for k, v in entries.items()}


class BatchedSMG2D:
    """Batched 2-D SMG over B independent planes [B, n2, n1]:
    semicoarsens n2, relaxes with parity line block-GS (exact PCR line
    solves along n1)."""

    def __init__(self, entries, num_pre_relax=1, num_post_relax=1,
                 max_levels=0):
        self.pre = num_pre_relax
        self.post = num_post_relax
        self.levels = []
        ent = _host_entries(entries)
        B, n2, n1 = next(iter(ent.values())).shape
        nlev = int(np.log2(max(n2, 1))) + 2
        if max_levels > 0:
            nlev = min(nlev, max_levels)
        for l in range(nlev):
            lo, di, up = _line_bands(ent)
            lvl = dict(
                entries={k: jnp.asarray(v) for k, v in ent.items()},
                bands=(jnp.asarray(lo), jnp.asarray(di), jnp.asarray(up)),
            )
            n2l = next(iter(ent.values())).shape[1]
            if n2l <= 1 or l == nlev - 1:
                self.levels.append(lvl)
                break
            p_lo, p_hi = self._interp_weights(ent, (lo, di, up))
            lvl["p_lo"] = jnp.asarray(p_lo[:, 1::2])
            lvl["p_hi"] = jnp.asarray(p_hi[:, 1::2])
            self.levels.append(lvl)
            ent = self._rap(ent, p_lo, p_hi)

    # -- setup helpers (host) -------------------------------------------
    @staticmethod
    def _interp_weights(ent, bands):
        """smg_setup_interp.c analog in 2-D: P weight for cdir2 offset o
        solves the line system against -(couplings with d2 == -o),
        in-line shifts masked to the grid."""
        lo, di, up = bands
        B, n2, n1 = di.shape
        i1 = np.arange(n1)
        out = {}
        for o in (-1, 1):
            rhs = np.zeros((B, n2, n1))
            for (d2, d1), c in ent.items():
                if d2 == -o:
                    ok = ((i1 + d1 >= 0) & (i1 + d1 < n1)).astype(float)
                    rhs -= c * ok
            out[o] = _thomas_host(lo, di, up, rhs)
        return out[1], out[-1]  # p_lo, p_hi (lower/upper coarse donor)

    @staticmethod
    def _rap(ent, p_lo, p_hi):
        """Exact per-plane Galerkin RAP, reassembled into batched coarse
        stencil entries (hypre smg2_setup_rap.c role)."""
        B, n2, n1 = next(iter(ent.values())).shape
        n2c = (n2 + 1) // 2
        nf, nc = n2 * n1, n2c * n1
        i2, i1 = np.indices((n2, n1))
        row = (i2 * n1 + i1).ravel()

        out_entries = {}
        for b in range(B):
            rows_l, cols_l, vals_l = [], [], []
            for (d2, d1), c in ent.items():
                j2, j1 = i2 + d2, i1 + d1
                ok = (j2 >= 0) & (j2 < n2) & (j1 >= 0) & (j1 < n1)
                rows_l.append(row[ok.ravel()])
                cols_l.append((j2[ok] * n1 + j1[ok]).ravel())
                vals_l.append(c[b][ok])
            A2 = sp.coo_matrix(
                (np.concatenate(vals_l),
                 (np.concatenate(rows_l), np.concatenate(cols_l))),
                shape=(nf, nf),
            ).tocsr()
            # P: coarse (J, i1) -> fine rows 2J (identity), 2J+-1 (weights)
            pr, pc, pv = [], [], []
            J2, J1 = np.indices((n2c, n1))
            crow = (J2 * n1 + J1).ravel()
            pr.append((2 * J2 * n1 + J1).ravel()); pc.append(crow)
            pv.append(np.ones(nc))
            odd2, odd1 = np.indices(((n2 - 1) // 2 + (n2 % 2 == 0), n1))
            f2 = 2 * odd2 + 1
            frow = (f2 * n1 + odd1).ravel()
            pr.append(frow); pc.append((odd2 * n1 + odd1).ravel())
            pv.append(p_lo[b][1::2].ravel())
            hi_ok = odd2 + 1 < n2c
            pr.append(frow[hi_ok.ravel()])
            pc.append(((odd2 + 1) * n1 + odd1)[hi_ok].ravel())
            pv.append(p_hi[b][1::2][hi_ok])
            P = sp.coo_matrix(
                (np.concatenate(pv), (np.concatenate(pr), np.concatenate(pc))),
                shape=(nf, nc),
            ).tocsr()
            C = (P.T @ A2 @ P).tocoo()
            C.sum_duplicates()
            r2, r1 = C.row // n1, C.row % n1
            c2, c1 = C.col // n1, C.col % n1
            d2a, d1a = c2 - r2, c1 - r1
            key_all = d2a * 8 + d1a  # |d1| <= 2 so this is injective
            for key in np.unique(key_all):
                m = key_all == key
                d2 = int(d2a[m][0])
                d1 = int(d1a[m][0])
                arr = out_entries.setdefault(
                    (d2, d1), np.zeros((B, n2c, n1))
                )
                arr[b][r2[m], r1[m]] = C.data[m]
        return out_entries

    # -- solve (device) --------------------------------------------------
    def _line_update(self, lvl, x, b, parity):
        lo, di, up = lvl["bands"]
        r = b - _apply2d(lvl["entries"], x)
        e = pcr_solve_batched(lo, di, up, r)
        n2 = x.shape[1]
        mask = (jnp.arange(n2) % 2 == parity)[None, :, None]
        return x + jnp.where(mask, e, 0.0)

    def _relax(self, lvl, x, b, sweeps, up=False):
        order = (1, 0) if up else (0, 1)
        for _ in range(sweeps):
            for par in order:
                x = self._line_update(lvl, x, b, par)
        return x

    @staticmethod
    def _restrict(lvl, r):
        p_lo, p_hi = lvl["p_lo"], lvl["p_hi"]
        n2 = r.shape[1]
        nc = (n2 + 1) // 2
        no = n2 // 2
        r_even = r[:, 0::2]
        r_odd = r[:, 1::2]
        bc = r_even
        bc = bc.at[:, :no].add(p_lo * r_odd)
        nhi = min(no, nc - 1)
        bc = bc.at[:, 1: 1 + nhi].add((p_hi * r_odd)[:, :nhi])
        return bc

    @staticmethod
    def _interp_add(lvl, x, ec):
        p_lo, p_hi = lvl["p_lo"], lvl["p_hi"]
        n2 = x.shape[1]
        nc = (n2 + 1) // 2
        no = n2 // 2
        x = x.at[:, 0::2].add(ec)
        e_lo = ec[:, :no]
        pad = max(0, no + 1 - nc)
        e_hi = jnp.pad(ec, ((0, 0), (0, pad), (0, 0)))[:, 1: no + 1]
        x = x.at[:, 1::2].add(p_lo * e_lo + p_hi * e_hi)
        return x

    def _level_fns(self, l):
        """Per-2-D-level compiled pieces (descend / ascend / bottom),
        cached — same bounded-program structure as the 3-D SMG
        (smg.SMG._level_fns): no XLA program ever contains more than
        one 2-D level's relax work."""
        if not hasattr(self, "_fns"):
            self._fns = {}
        fns = self._fns.get(l)
        if fns is not None:
            return fns
        lvl = self.levels[l]
        if l == len(self.levels) - 1:
            @jax.jit
            def bottom(b):
                x = jnp.zeros_like(b)
                x = self._line_update(lvl, x, b, 0)
                return self._line_update(lvl, x, b, 1)

            @jax.jit
            def resid(x, b):
                return b - _apply2d(lvl["entries"], x)

            fns = {"bottom": bottom, "resid": resid}
        else:
            @jax.jit
            def down(b):
                x = self._relax(lvl, jnp.zeros_like(b), b, self.pre)
                r = b - _apply2d(lvl["entries"], x)
                return x, self._restrict(lvl, r)

            @jax.jit
            def up(x, b, ec):
                x = self._interp_add(lvl, x, ec)
                return self._relax(lvl, x, b, self.post, up=True)

            @jax.jit
            def resid(x, b):
                return b - _apply2d(lvl["entries"], x)

            fns = {"down": down, "up": up, "resid": resid}
        self._fns[l] = fns
        return fns

    def _vcycle(self, l, b):
        if l == len(self.levels) - 1:
            return self._level_fns(l)["bottom"](b)
        fns = self._level_fns(l)
        x, bc = fns["down"](b)
        ec = self._vcycle(l + 1, bc)
        return fns["up"](x, b, ec)

    def solve(self, b, cycles: int = 1):
        """Approximate plane solves: `cycles` V-cycles, zero guess
        (hypre runs one V-cycle per relax; setup uses a few), driven
        from host over the per-level programs."""
        x = self._vcycle(0, b)
        for _ in range(cycles - 1):
            r = self._level_fns(0)["resid"](x, b)
            x = x + self._vcycle(0, r)
        return x
