"""Measure candidate TAIL-apply primitives on the real TPU.

The hybrid relocated form = top-K-offset DIA (Pallas streaming) + an
exact remainder of T entries at rare offsets.  The remainder needs
y[row] += val * x[col] for T scattered (row, col) pairs on a lattice of
ncells.  Candidates:
  seg   — entries sorted by row, gather x[col], jax.ops.segment_sum
          over compressed row ids, scatter-add the per-row sums
  sca   — direct zeros(n).at[row].add(val * x[col])
  ell   — pad rows to width W: cols[nrows_t, W] 2-D gather + row-sum,
          then scatter-add at unique row ids (unique_indices=True)
Chained-k marginal timing with scalar readback (tunnel-safe).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ncells = 122880
for T in (8192, 32768, 131072):
    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, ncells, size=T).astype(np.int32))
    cols = rng.integers(0, ncells, size=T).astype(np.int32)
    vals = rng.standard_normal(T).astype(np.float32)
    x = rng.standard_normal(ncells).astype(np.float32)

    urows, seg = np.unique(rows, return_inverse=True)
    seg = seg.astype(np.int32)
    nseg = len(urows)

    # ELL padding by row
    cnt = np.bincount(seg, minlength=nseg)
    W = int(cnt.max())
    ell_cols = np.zeros((nseg, W), np.int32)
    ell_vals = np.zeros((nseg, W), np.float32)
    slot = np.zeros(nseg, np.int64)
    for t in range(T):
        s = seg[t]
        ell_cols[s, slot[s]] = cols[t]
        ell_vals[s, slot[s]] = vals[t]
        slot[s] += 1

    def f_seg(x, rows_u, seg, cols, vals):
        contrib = vals * x[cols]
        per_row = jax.ops.segment_sum(contrib, seg, num_segments=nseg)
        return jnp.zeros(ncells, x.dtype).at[rows_u].add(
            per_row, unique_indices=True)

    def f_sca(x, rows, cols, vals):
        return jnp.zeros(ncells, x.dtype).at[rows].add(vals * x[cols])

    def f_ell(x, rows_u, ec, ev):
        per_row = (ev * x[ec]).sum(axis=1)
        return jnp.zeros(ncells, x.dtype).at[rows_u].add(
            per_row, unique_indices=True)

    ref = np.zeros(ncells, np.float32)
    np.add.at(ref, rows, vals * x[cols])

    def bench(name, fn, *args):
        def chain(k, *a):
            def body(i, acc):
                return acc + fn(*a)
            return jax.lax.fori_loop(0, k, body, jnp.zeros(ncells))[:1]
        c8 = jax.jit(lambda *a: chain(8, *a))
        c72 = jax.jit(lambda *a: chain(72, *a))
        try:
            r = np.asarray(jax.jit(fn)(*args))
            ok = np.allclose(r, ref, atol=1e-3)
            float(c8(*args)[0]); float(c72(*args)[0])
            t8 = t72 = float("inf")
            for _ in range(2):
                t0 = time.perf_counter(); float(c8(*args)[0])
                t8 = min(t8, time.perf_counter() - t0)
                t0 = time.perf_counter(); float(c72(*args)[0])
                t72 = min(t72, time.perf_counter() - t0)
            us = (t72 - t8) / 64 * 1e6
            print(f"T={T:7d} {name}: {us:9.1f} us/apply  correct={ok}  (W={W})")
        except Exception as e:
            print(f"T={T:7d} {name}: FAIL {type(e).__name__}: {str(e)[:100]}")

    xj = jnp.asarray(x)
    bench("seg", f_seg, xj, jnp.asarray(urows), jnp.asarray(seg),
          jnp.asarray(cols), jnp.asarray(vals))
    bench("sca", f_sca, xj, jnp.asarray(rows), jnp.asarray(cols),
          jnp.asarray(vals))
    bench("ell", f_ell, xj, jnp.asarray(urows), jnp.asarray(ell_cols),
          jnp.asarray(ell_vals))
