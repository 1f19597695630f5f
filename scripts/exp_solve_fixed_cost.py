"""Split bench solve time into per-iteration vs per-call fixed cost.

Runs the bench solve jit with tol=0 at two forced iteration counts;
the marginal difference is the true per-iteration cost, the remainder
is per-call overhead (arg marshaling through the remote tunnel,
while_loop entry, final norms).  Also counts hierarchy pytree leaves.
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
from hypre_tpu.solvers.krylov import PCGOptions, pcg

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
print(f"hierarchy leaves: {len(jax.tree.leaves(levels))}")
b = jnp.ones(n, dtype=jnp.float32)


def make(maxit):
    @jax.jit
    def solve(levels, b):
        op = lambda x: spmv(levels[0].A, x)
        M = lambda r: amg.cycle(r, levels=levels)
        return pcg(op, b, M=M, opts=PCGOptions(
            tol=0.0, max_iter=maxit, two_norm=True))
    return solve

for k1, k2 in ((21, 63),):
    s1, s2 = make(k1), make(k2)
    r = s1(levels, b); float(r.rel_residual_norm)
    r = s2(levels, b); float(r.rel_residual_norm)
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = s1(levels, b); float(r.rel_residual_norm)
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        r = s2(levels, b); float(r.rel_residual_norm)
        t2 = min(t2, time.perf_counter() - t0)
    per_iter = (t2 - t1) / (k2 - k1)
    fixed = t1 - k1 * per_iter
    print(f"t({k1})={t1*1e3:.1f}ms t({k2})={t2*1e3:.1f}ms  "
          f"per-iter={per_iter*1e3:.2f}ms  fixed={fixed*1e3:.1f}ms")
