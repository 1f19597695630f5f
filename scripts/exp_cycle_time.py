"""Where does the V-cycle's time go beyond its measured ops?

Times, all chained with the hierarchy passed as a jit ARG:
  1. full cycle
  2. level-0-only work: smooth + residual + smooth (no descent)
  3. level-0+1 work: full level-0 visit + R + L1 smooth/residual + P
  4. PCG iteration without preconditioner (M = identity)
Usage: python scripts/exp_cycle_time.py [size]
"""
import functools
import os
import sys
import time

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
b = jnp.ones(n, dtype=jnp.float32)


def timed_chain(fn, k1=8, k2=40):
    """fn(levels, x) -> vector; chained via fori_loop, levels as args."""
    def chain(k, lv, x):
        def body(i, v):
            return fn(lv, v) * jnp.asarray(0.13, v.dtype) + v
        return jax.lax.fori_loop(0, k, body, x)[:1]
    ca = jax.jit(lambda lv, x: chain(k1, lv, x))
    cb = jax.jit(lambda lv, x: chain(k2, lv, x))
    float(ca(levels, b)[0]); float(cb(levels, b)[0])
    ta = tb = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(ca(levels, b)[0])
        ta = min(ta, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(cb(levels, b)[0])
        tb = min(tb, time.perf_counter() - t0)
    return (tb - ta) / (k2 - k1)


from hypre_tpu.ops.transfer import unview


def cyc(lv, v):
    return amg.cycle(v, levels=lv)


def l0_visit(lv, v):
    l0 = unview(lv[0])
    u = l0.l1inv * v                      # zero-guess smooth
    r = v - spmv(l0.A, u)                 # residual
    u = u + l0.l1inv * (v - spmv(l0.A, u))  # post smooth
    return u + r * jnp.asarray(1e-7, v.dtype)


def l01_visit(lv, v):
    l0, l1 = unview(lv[0]), unview(lv[1])
    u = l0.l1inv * v
    r = v - spmv(l0.A, u)
    f1 = spmv(l0.R, r)
    u1 = l1.l1inv * f1
    r1 = f1 - spmv(l1.A, u1)
    u1 = u1 + l1.l1inv * r1
    u = u + spmv(l0.P, u1)
    u = u + l0.l1inv * (v - spmv(l0.A, u))
    return u


print(f"l0 visit     : {timed_chain(l0_visit) * 1e6:8.1f} us")
print(f"l0+l1 visit  : {timed_chain(l01_visit) * 1e6:8.1f} us")
print(f"full cycle   : {timed_chain(cyc) * 1e6:8.1f} us")
