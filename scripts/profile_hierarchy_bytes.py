"""Per-level frozen-operator byte breakdown for the bench config.

Runs the bench's exact BoomerAMG setup on CPU (no tunnel) and prints,
per level, the frozen A/P/R leaf bytes — to localize setup-transfer
volume (round-3 investigation: ~1.2GB observed for a 25MB fine op).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import hypre_tpu  # noqa: F401
from hypre_tpu.models import laplacian_7pt
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
interp = "ext+i" if nx < 96 else "classical"
A = laplacian_7pt(nx, nx, nx)
amg = BoomerAMG(
    A,
    BoomerAMGOptions(
        coarsen_type="pmis",
        interp_type=interp,
        P_max_elmts=4,
        trunc_factor=0.0,
        relax_down=18,
        relax_up=18,
        dtype="float32",
        mat_dtype="bfloat16",
        nongalerkin_tol=0.02,
        relocate_level2=nx < 224,
        lattice_shape=(nx, nx, nx),
    ),
)


def leaves_bytes(M):
    if M is None:
        return 0, {}
    total = 0
    shapes = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(M)[0]:
        if hasattr(leaf, "nbytes"):
            total += leaf.nbytes
            shapes[jax.tree_util.keystr(path)] = (
                tuple(leaf.shape), str(leaf.dtype), leaf.nbytes)
    return total, shapes


grand = 0
for i, lvl in enumerate(amg.levels):
    row = {}
    for name in ("A", "P", "R"):
        M = getattr(lvl, name, None)
        b, shapes = leaves_bytes(M)
        grand += b
        row[name] = (type(M).__name__ if M is not None else "-", b, shapes)
    n = row["A"][1]
    print(f"level {i}: A={row['A'][0]} {row['A'][1]/1e6:.1f}MB  "
          f"P={row['P'][0]} {row['P'][1]/1e6:.1f}MB  "
          f"R={row['R'][0]} {row['R'][1]/1e6:.1f}MB")
    for name in ("A", "P", "R"):
        for k, v in row[name][2].items():
            if v[2] > 20e6:
                print(f"    {name}{k}: shape={v[0]} dtype={v[1]} "
                      f"{v[2]/1e6:.1f}MB")
print(f"TOTAL frozen bytes: {grand/1e6:.1f}MB")

print("\nhost hierarchy (true sizes):")
tot_nnz = 0
for i, Ah in enumerate(amg._host_A):
    tot_nnz += Ah.nnz
    Ph = amg._host_P[i] if i < len(amg._host_P) else None
    print(f"level {i}: n={Ah.shape[0]:8d} nnz={Ah.nnz:9d} "
          f"nnz/row={Ah.nnz/max(1,Ah.shape[0]):.1f}"
          + (f"  P nnz={Ph.nnz}" if Ph is not None else ""))
print(f"total nnz={tot_nnz} -> ELL bf16+i32 bytes ~ "
      f"{tot_nnz*6/1e6:.0f}MB; bf16-only {tot_nnz*2/1e6:.0f}MB")
