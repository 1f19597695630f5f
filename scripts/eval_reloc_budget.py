"""Iteration-count + frozen-bytes eval of the relocated-form offset
budgets (CPU, bench protocol: b=ones, two-norm PCG, tol 1e-6).

usage: python scripts/eval_reloc_budget.py [size] [Abudget] [Pbudget]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EVAL_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import time

import jax.numpy as jnp
import numpy as np

import hypre_tpu  # noqa: F401
from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import spmv
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
ab = int(sys.argv[2]) if len(sys.argv) > 2 else 128
pb = int(sys.argv[3]) if len(sys.argv) > 3 else 96
lump = sys.argv[4] if len(sys.argv) > 4 else "strong"
n = nx**3
A = laplacian_7pt(nx, nx, nx)

t0 = time.perf_counter()
amg = BoomerAMG(
    A,
    BoomerAMGOptions(
        coarsen_type="pmis",
        interp_type="ext+i" if nx < 96 else "classical",
        P_max_elmts=4, trunc_factor=0.0, relax_down=18, relax_up=18,
        dtype="float32", mat_dtype="bfloat16", nongalerkin_tol=0.02,
        relocate_level2=True, lattice_shape=(nx, nx, nx),
        relocate_offset_budget=ab, transfer_offset_budget=pb,
        relocate_lump=lump,
    ),
)
setup_s = time.perf_counter() - t0

frozen = 0
for lvl in amg.levels:
    for leaf in jax.tree.leaves(lvl):
        if hasattr(leaf, "nbytes"):
            frozen += leaf.nbytes

b = jnp.ones(n, dtype=jnp.float32)
levels = amg.levels_tuple


@jax.jit
def solve(levels, b):
    op = lambda x: spmv(levels[0].A, x)
    M = lambda r: amg.cycle(r, levels=levels)
    return pcg(op, b, M=M, opts=PCGOptions(tol=1e-6, max_iter=200, two_norm=True))


res = solve(levels, b)
print(f"size={nx} Abudget={ab} Pbudget={pb} lump={lump}: iters={int(res.num_iterations)} "
      f"converged={bool(res.converged)} rel={float(res.rel_residual_norm):.2e} "
      f"frozenMB={frozen/1e6:.0f} setup_s={setup_s:.1f} "
      f"levels={amg.num_levels}")
