"""Device-side strength + PMIS coarsening for lattice (DIA) operators.

Reference: par_strength.c hypre_BoomerAMGCreateS + par_coarsen.c
hypre_BoomerAMGCoarsenPMISHost (:2031-2738) — and their *_device.c
GPU counterparts, whose existence is the precedent for a separate
device pipeline.

TPU design: for a stencil operator stored as diagonals, every PMIS
ingredient is an elementwise/shift computation — no gathers:
  * strength: per-offset strict-inequality tests against the row
    scale (max/min of off-diagonal entries, computed as an elementwise
    reduction over the diagonal rows);
  * measures: S^T column counts = shifted sums of the S masks;
  * the iterated independent set: neighbor comparisons over S u S^T =
    per-offset shifted lexicographic compares of (count, lcg_state).
Measure comparisons use the INTEGER pair (strong-transpose count,
Park-Miller state): count + state/M orders identically to
(count, state), so CF decisions are bit-identical to the f64 host path
— no floating-point tie hazards.  LCG states come from the host's
vectorized skip-ahead (utils/lcg.py) as int32.

The driver (`device_pmis`) runs the whole loop as one jitted
lax.while_loop; the CF marker returns to the host to continue setup.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.lcg import M as _LCG_M
from ...utils.lcg import lcg_skip

_PMIS_SEED = 2747


def lcg_states_host(seed: int, n: int, skip: int = 0) -> np.ndarray:
    """The n int32 Park-Miller STATES hypre_Rand would traverse
    (state/M is the returned real; state ordering == value ordering)."""
    if n == 0:
        return np.empty(0, dtype=np.int32)
    x0 = lcg_skip(seed, skip + 1)
    out = np.empty(n, dtype=np.int64)
    out[0] = x0
    # vectorized doubling fill: out[2^j .. 2^(j+1)) = out[0..2^j) * a^(2^j)
    from ...utils import lcg as _lcg

    filled = 1
    j = 0
    while filled < n:
        step = _lcg._POW2[j]
        take = min(filled, n - filled)
        out[filled: filled + take] = (out[:take] * step) % _LCG_M
        filled += take
        j += 1
    return out.astype(np.int32)


def _shift(x, off, fill=0):
    """y[i] = x[i + off] with `fill` outside (static off)."""
    n = x.shape[0]
    if off == 0:
        return x
    pad = abs(int(off))
    xp = jnp.pad(x, (pad, pad), constant_values=fill)
    return jax.lax.dynamic_slice_in_dim(xp, pad + off, n)


@partial(jax.jit, static_argnames=("offsets", "theta", "max_row_sum"))
def device_strength_masks(data, offsets, theta=0.25, max_row_sum=0.9):
    """Per-offset strong masks S_k[i] ("row i strongly depends on
    i+off_k"), mirroring strength_matrix's strict tests."""
    return strength_masks_impl(data, offsets, theta, max_row_sum)


def strength_masks_impl(data, offsets, theta, max_row_sum):
    """Row-local body (the strength test reads only row i's entries, so
    it needs no neighbor values and is shard-invariant as is)."""
    diag_k = offsets.index(0)
    diag = data[diag_k][: data.shape[1]]
    neg = diag < 0
    row_max = jnp.zeros_like(diag)
    row_min = jnp.zeros_like(diag)
    for k, off in enumerate(offsets):
        if off == 0:
            continue
        row_max = jnp.maximum(row_max, data[k])
        row_min = jnp.minimum(row_min, data[k])
    scale = jnp.where(neg, row_max, row_min)
    thresh = theta * scale
    masks = []
    rs = jnp.zeros_like(diag)
    for k, off in enumerate(offsets):
        rs = rs + data[k]
    weak_row = (
        jnp.abs(rs) > jnp.abs(diag) * max_row_sum
        if max_row_sum < 1.0 else jnp.zeros_like(neg)
    )
    for k, off in enumerate(offsets):
        if off == 0:
            masks.append(jnp.zeros_like(neg))
            continue
        s = jnp.where(neg, data[k] > thresh, data[k] < thresh)
        masks.append(s & ~weak_row)
    return jnp.stack(masks)


def _np_shift(x, off, fill=0):
    """numpy twin of _shift: y[i] = x[i + off], `fill` outside."""
    n = x.shape[0]
    off = int(off)
    if off == 0:
        return x
    out = np.full(n, fill, dtype=x.dtype)
    if off > 0:
        out[: n - off] = x[off:]
    else:
        out[-off:] = x[: n + off]
    return out


def lattice_pmis_host(data, offsets, n, seed: int = _PMIS_SEED,
                      theta: float = 0.25, max_row_sum: float = 0.9):
    """Host (numpy) twin of device_pmis for a DIA lattice operator:
    the same integer-pair measure comparisons, round structure, and
    tie semantics, so the CF marker is BITWISE identical to
    device_pmis / coarsen.pmis_coarsen (asserted in
    tests/test_device_coarsen.py).  Purpose: the graded device-setup
    chain needs a PMIS whose cost does not depend on the remote XLA
    compile service — the jitted while_loop program's dispatch was
    observed to stall 70-600+ s through a degraded axon service even
    with a warm persistent cache (GAPS.md), while every other chain
    program loads in <1 s.  At 884k rows this runs ~0.5 s of pure
    numpy; the sharded/device variants remain for mesh execution."""
    data = np.asarray(data)[:, :n].astype(np.float32)
    offsets = tuple(int(o) for o in offsets)
    lcg = lcg_states_host(seed, n)

    diag_k = offsets.index(0)
    diag = data[diag_k]
    neg = diag < 0
    row_max = np.zeros_like(diag)
    row_min = np.zeros_like(diag)
    for k, off in enumerate(offsets):
        if off == 0:
            continue
        np.maximum(row_max, data[k], out=row_max)
        np.minimum(row_min, data[k], out=row_min)
    thresh = np.float32(theta) * np.where(neg, row_max, row_min)
    rs = data.sum(axis=0, dtype=np.float32)
    weak_row = (np.abs(rs) > np.abs(diag) * np.float32(max_row_sum)
                if max_row_sum < 1.0 else np.zeros(n, bool))
    S = np.zeros((len(offsets), n), dtype=bool)
    for k, off in enumerate(offsets):
        if off == 0:
            continue
        s = np.where(neg, data[k] > thresh, data[k] < thresh)
        S[k] = s & ~weak_row

    cnt = np.zeros(n, np.int32)
    for k, off in enumerate(offsets):
        if off != 0:
            cnt += _np_shift(S[k].astype(np.int32), -off)
    isolated = ~S.any(axis=0)
    cf = np.where(isolated, np.int8(-3), np.int8(0))
    in_graph = ~isolated
    cnt = np.where(isolated, 0, cnt).astype(np.int32)

    adj_offs = sorted({o for o in offsets if o != 0} |
                      {-o for o in offsets if o != 0})
    k_of = {o: k for k, o in enumerate(offsets)}

    def adj_mask(off):
        m = np.zeros(n, bool)
        if off in k_of:
            m |= S[k_of[off]]
        if -off in k_of:
            m |= _np_shift(S[k_of[-off]], off)
        return m

    it = 0
    while in_graph.any() and it < 500:
        cand = in_graph & (cnt >= 1)
        dominated = np.zeros(n, bool)
        ccnt = np.where(cand, cnt, 0).astype(np.int32)
        clcg = np.where(cand, lcg, 0).astype(np.int32)
        for off in adj_offs:
            nb_cand = _np_shift(cand, off, fill=False)
            nb_cnt = _np_shift(ccnt, off)
            nb_lcg = _np_shift(clcg, off)
            better = (nb_cnt > cnt) | ((nb_cnt == cnt) & (nb_lcg > lcg))
            dominated |= adj_mask(off) & nb_cand & better
        in_is = cand & ~dominated
        cf = np.where(in_is, np.int8(1), cf)

        is_c = cf > 0
        newly_f = in_graph & (cnt < 1)
        infl_c = np.zeros(n, bool)
        for k, off in enumerate(offsets):
            if off == 0:
                continue
            infl_c |= S[k] & _np_shift(is_c, off, fill=False)
        newly_f |= in_graph & ~is_c & infl_c
        cf = np.where(in_graph & is_c, np.int8(1), cf)
        cf = np.where(newly_f, np.int8(-1), cf)
        settled = in_graph & (cf != 0)
        cnt = np.where(settled, 0, cnt).astype(np.int32)
        in_graph = in_graph & (cf == 0)
        it += 1
    return cf.astype(np.int8)


def device_pmis(data, offsets, n, seed: int = _PMIS_SEED,
                theta: float = 0.25, max_row_sum: float = 0.9):
    """CF marker (int8: 1 C, -1 F, -3 isolated) for a DIA stencil
    operator — bit-identical to coarsen.pmis_coarsen on the same
    matrix.  `data` [noff, >=n] row-aligned diagonals."""
    offsets = tuple(int(o) for o in offsets)
    # device_put, NOT jnp.asarray: through remote-device tunnels the
    # asarray upload path runs ~3 orders of magnitude slower than the
    # bulk device_put path (measured 388 s vs 0.5 s for 25 MB) — the
    # round-3 "device setup is unbounded" variance was exactly this
    from ...ops.transfer import fast_device_put

    lcg = fast_device_put(lcg_states_host(seed, n))
    if not isinstance(data, jax.Array):
        data = fast_device_put(np.asarray(data)[:, :n])
    return _device_pmis_run(
        data[:, :n], lcg, offsets=offsets, n=n,
        theta=float(theta), max_row_sum=float(max_row_sum),
    )


@partial(jax.jit, static_argnames=("offsets", "n", "theta", "max_row_sum"))
def _device_pmis_run(data, lcg, *, offsets, n, theta, max_row_sum):
    return pmis_impl(
        data, lcg, offsets=offsets, n=n, theta=theta,
        max_row_sum=max_row_sum, shift=_shift, any_fn=jnp.any,
    )


def pmis_impl(data, lcg, *, offsets, n, theta, max_row_sum, shift, any_fn):
    """Shift-parameterized PMIS body.  `shift(x, off, fill)` supplies
    neighbor values (`_shift` = single image; a halo-exchange closure =
    sharded, see parallel/dist_setup.py — the par_coarsen.c:2741 CommPkg
    exchanges of measures/CF markers re-expressed as collectives).
    `any_fn` must be a GLOBAL any: inside shard_map every shard has to
    run the same trip count or the collectives in the body deadlock."""
    S = strength_masks_impl(data, offsets, theta, max_row_sum)

    # S^T column counts: cnt[i] = sum_k S_k[i - off_k]
    cnt = jnp.zeros(n, jnp.int32)
    for k, off in enumerate(offsets):
        if off == 0:
            continue
        cnt = cnt + shift(S[k].astype(jnp.int32), -off)

    has_strong_row = jnp.zeros(n, bool)
    for k, off in enumerate(offsets):
        if off != 0:
            has_strong_row = has_strong_row | S[k]
    isolated = ~has_strong_row

    cf0 = jnp.where(isolated, jnp.int8(-3), jnp.int8(0))
    in0 = ~isolated
    cnt0 = jnp.where(isolated, 0, cnt)

    # adjacency offsets of S u S^T: for each off, i ~ i+off iff
    # S_off[i] (dependence) or S_{-off}[i+off] (influence)
    adj_offs = sorted({o for o in offsets if o != 0} |
                      {-o for o in offsets if o != 0})
    k_of = {o: k for k, o in enumerate(offsets)}

    def adj_mask(Smask, off):
        m = jnp.zeros(n, bool)
        if off in k_of:
            m = m | Smask[k_of[off]]
        if -off in k_of:
            m = m | shift(Smask[k_of[-off]], off)
        return m

    def body(st):
        it, cf, in_graph, cnt = st
        cand = in_graph & (cnt >= 1)  # measure>1 <=> count>=1 (rand<1)
        dominated = jnp.zeros(n, bool)
        for off in adj_offs:
            nb_cand = shift(cand, off, fill=False)
            nb_cnt = shift(jnp.where(cand, cnt, 0), off)
            nb_lcg = shift(jnp.where(cand, lcg, 0), off)
            better = (nb_cnt > cnt) | ((nb_cnt == cnt) & (nb_lcg > lcg))
            dominated = dominated | (adj_mask(S, off) & nb_cand & better)
        in_is = cand & ~dominated
        cf = jnp.where(in_is, jnp.int8(1), cf)

        is_c = cf > 0
        newly_f = in_graph & (cnt < 1)
        infl_c = jnp.zeros(n, bool)
        for k, off in enumerate(offsets):
            if off == 0:
                continue
            infl_c = infl_c | (S[k] & shift(is_c, off, fill=False))
        newly_f = newly_f | (in_graph & ~is_c & infl_c)

        cf = jnp.where(in_graph & is_c, jnp.int8(1), cf)
        cf = jnp.where(newly_f, jnp.int8(-1), cf)
        settled = in_graph & (cf != 0)
        cnt = jnp.where(settled, 0, cnt)
        in_graph = in_graph & (cf == 0)
        return it + 1, cf, in_graph, cnt

    def cond(st):
        it, cf, in_graph, cnt = st
        return any_fn(in_graph) & (it < 500)

    _, cf, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), cf0, in0, cnt0)
    )
    return cf
