"""How much |value| mass and nnz do the top-K lattice offsets carry at
each relocated level?  Sizes the offset-budget for non-Galerkin-style
pruned DIA forms (round-3 cycle-efficiency work)."""
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
A = laplacian_7pt(nx, nx, nx)
amg = BoomerAMG(
    A,
    BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        trunc_factor=0.0, relax_down=18, relax_up=18,
        dtype="float32", mat_dtype="bfloat16", nongalerkin_tol=0.02,
        relocate_level2=True, lattice_shape=(nx, nx, nx),
    ),
)

# reproduce the relocation plan geometry
cpos0 = amg._plan_embed()
plan = amg._plan_reloc(cpos0)
for ent in plan:
    k = ent["k"]
    Ak = amg._host_A[k].tocoo()
    rcell = ent["rcell"]
    offs = rcell[Ak.col] - rcell[Ak.row]
    absval = np.abs(Ak.data)
    # group by offset
    uoff, inv = np.unique(offs, return_inverse=True)
    mass = np.bincount(inv, weights=absval)
    cnt = np.bincount(inv)
    order = np.argsort(-mass)
    cmass = np.cumsum(mass[order]) / mass.sum()
    ccnt = np.cumsum(cnt[order]) / cnt.sum()
    print(f"level {k}: n={Ak.shape[0]} nnz={Ak.nnz} ncells={ent['ncells']} "
          f"load={Ak.shape[0]/ent['ncells']:.2f} noffs={len(uoff)}")
    for K in (32, 48, 64, 96, 128, 192, 256):
        if K <= len(uoff):
            print(f"   top-{K:3d}: mass={cmass[K-1]:.4f} nnz={ccnt[K-1]:.4f}")
    # also dropped-mass relative to diagonal mass
    diag_mass = mass[np.searchsorted(uoff, 0)] if 0 in uoff else 0.0
    print(f"   diag offset mass frac={diag_mass/mass.sum():.3f}")
