"""Dump per-level frozen forms/sizes at bench config (round-3 probe)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
import hypre_tpu
from hypre_tpu.models import laplacian_7pt
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
A = laplacian_7pt(nx, nx, nx)
# mirror bench.py's interp selection so the "bench config" label holds
# at any nx (ext+i below 96^3, classical above)
interp = "ext+i" if nx < 96 else "classical"
amg = BoomerAMG(A, BoomerAMGOptions(
    coarsen_type="pmis", interp_type=interp, P_max_elmts=4,
    trunc_factor=0.0, relax_down=18, relax_up=18,
    dtype="float32", mat_dtype="bfloat16", nongalerkin_tol=0.02,
    relocate_level2=nx < 224, lattice_shape=(nx, nx, nx)))

def describe(M):
    if M is None: return "-"
    t = type(M).__name__
    extra = ""
    if hasattr(M, "dia"):
        extra = f" dia_offs={len(M.dia.offsets)} tail={M.tail.vals.size if M.tail is not None else 0}"
    elif hasattr(M, "offsets"):
        extra = f" offs={len(M.offsets)}"
    elif hasattr(M, "mats"):
        offs = [len(m.offsets) for m in M.mats]
        tl = getattr(M, "tail", None)
        extra = f" parities={len(M.mats)} offs={offs} tail={tl.vals.size if tl is not None else 0}"
    nb = sum(l.nbytes for l in jax.tree.leaves(M) if hasattr(l, "nbytes"))
    return f"{t}{extra} {nb/1e6:.1f}MB"

print(f"host sizes: {[h.shape[0] for h in amg._host_A]}")
for l, lvl in enumerate(amg.levels):
    print(f"L{l}: n_host={amg._host_A[l].shape[0] if l < len(amg._host_A) else '?'}")
    print(f"   A: {describe(lvl.A)}")
    print(f"   P: {describe(lvl.P)}")
    print(f"   R: {describe(lvl.R)}")
    if lvl.coarse_inv is not None:
        print(f"   coarse_inv: {describe(lvl.coarse_inv)}")
