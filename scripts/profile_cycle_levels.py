"""Per-level V-cycle op-time breakdown on the real TPU.

Times each level's primitive ops (l1-Jacobi smooth, residual A-matvec,
R apply, P apply) as chained-k marginals plus the full cycle, so the
cycle's time can be attributed level by level: streaming-bound levels
show times matching their operator bytes / HBM roofline; overhead-bound
levels show a floor.  Sizes the dense sub-cycle collapse.

Usage: python scripts/profile_cycle_levels.py [size]
"""
import os
import sys
import time
import functools
print = functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import hypre_tpu  # noqa: F401
from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import spmv
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
n = nx**3
A = laplacian_7pt(nx, nx, nx)
t0 = time.perf_counter()
amg = BoomerAMG(
    A,
    BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        trunc_factor=0.0, relax_down=18, relax_up=18,
        dtype="float32", mat_dtype="bfloat16", nongalerkin_tol=0.02,
        relocate_level2=nx < 224, lattice_shape=(nx, nx, nx),
    ),
)
print(f"setup {time.perf_counter() - t0:.1f}s, {amg.num_levels} levels")

levels = amg.levels_tuple


def op_bytes(M):
    if M is None:
        return 0
    return sum(leaf.nbytes for leaf in jax.tree.leaves(M)
               if hasattr(leaf, "nbytes"))


def timed_chain(fn, x0, k1=8, k2=72):
    def chain(k, x):
        def body(i, v):
            return fn(v)
        return jax.lax.fori_loop(0, k, body, x)[:1]
    ca = jax.jit(lambda x: chain(k1, x))
    cb = jax.jit(lambda x: chain(k2, x))
    float(ca(x0)[0]); float(cb(x0)[0])
    ta = tb = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(ca(x0)[0])
        ta = min(ta, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(cb(x0)[0])
        tb = min(tb, time.perf_counter() - t0)
    return (tb - ta) / (k2 - k1)


HBM = 819e9
L = amg.num_levels
total_ops = 0.0
for l, lvl in enumerate(levels):
    nl = (lvl.A.num_rows if hasattr(lvl.A, "num_rows") else
          op_bytes(lvl.dinv) // 4)
    x = jnp.ones(int(np.asarray(lvl.dinv).shape[0])
                 if lvl.dinv is not None else 8, jnp.float32)
    # residual-style matvec on this level
    try:
        tA = timed_chain(lambda v, M=lvl.A: spmv(M, v) * 0.13 + v, x)
    except Exception as e:
        print(f"   [A level {l} failed: {type(e).__name__}: {str(e)[:90]}]")
        tA = 0.0
    sol_A = op_bytes(lvl.A) / HBM
    row = (f"level {l}: A {tA*1e6:8.1f}us (sol {sol_A*1e6:6.1f}us, "
           f"{op_bytes(lvl.A)/1e6:7.1f}MB)")
    tP = tR = 0.0
    if lvl.P is not None and True:
        xc = jnp.ones(
            int(np.asarray(levels[l + 1].dinv).shape[0])
            if levels[l + 1].dinv is not None else 8, jnp.float32)
        try:
            tP = timed_chain(lambda v, M=lvl.P: spmv(M, v)[: v.shape[0]] * 0.1 + v, xc)
        except Exception as e:
            print(f"   [P level {l} failed: {type(e).__name__}: {str(e)[:90]}]")
            tP = 0.0
        try:
            tR = timed_chain(lambda v, M=lvl.R, xf=x: spmv(
                M, jnp.zeros(x.shape[0], jnp.float32).at[: v.shape[0]].set(v))
                [: v.shape[0]] * 0.1 + v, xc)
        except Exception as e:
            print(f"   [R level {l} failed: {type(e).__name__}: {str(e)[:90]}]")
            tR = 0.0
        row += (f"  P {tP*1e6:7.1f}us ({op_bytes(lvl.P)/1e6:6.1f}MB)"
                f"  R {tR*1e6:7.1f}us ({op_bytes(lvl.R)/1e6:6.1f}MB)")
    print(row)
    total_ops += 3 * tA + tP + tR

b = jnp.ones(n, dtype=jnp.float32)
t_cyc = timed_chain(
    lambda v: amg.cycle(v, levels=levels) * 0.13 + v, b, k1=4, k2=20)
print(f"\nfull cycle: {t_cyc*1e6:.1f} us;  sum(3A+P+R) of levels: "
      f"{total_ops*1e6:.1f} us")
