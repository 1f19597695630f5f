"""Setup-floor breakdown: bench-config BoomerAMG setup on the real TPU
with the warmed compile cache, printing every GLOBAL_TIMER phase plus
the untimed remainder.  Usage: python scripts/exp_setup_floor.py [size]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import hypre_tpu  # noqa: F401
from hypre_tpu.models import laplacian_7pt
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
from hypre_tpu.utils import tune_host_malloc
from hypre_tpu.utils.timing import GLOBAL_TIMER

tune_host_malloc()
nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
jax.block_until_ready(jax.device_put(np.zeros(8, np.float32)))

t0 = time.perf_counter()
A = laplacian_7pt(nx, nx, nx)
t_gen = time.perf_counter() - t0

t0 = time.perf_counter()
amg = BoomerAMG(
    A,
    BoomerAMGOptions(
        device_setup=True, device_rap=True,
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        trunc_factor=0.0, relax_down=18, relax_up=18,
        dtype="float32", mat_dtype="bfloat16", nongalerkin_tol=0.02,
        relocate_level2=nx < 224, lattice_shape=(nx, nx, nx),
        lattice_coeffs=(1.0, 1.0, 1.0),
    ),
)
total = time.perf_counter() - t0
acc = GLOBAL_TIMER.accumulated()
top = {k: v for k, v in acc.items()
       if k in ("SETUP", "FREEZE", "TRANSFER", "COLLAPSE")
       or k.startswith("DS_") or k in (
           "STRENGTH", "COARSEN", "INTERP", "RAP")}
print(f"gen {t_gen:.2f}s  setup total {total:.2f}s  "
      f"levels {amg.num_levels}")
timed_sum = 0.0
for k, v in sorted(acc.items(), key=lambda kv: -kv[1]):
    if v < 0.05:
        continue
    print(f"  {k:22s} {v:7.3f}")
    if k not in ("SETUP",) and "/" not in k and not k.startswith("XFER"):
        timed_sum += v if not k.startswith("DS_PMIS_") else 0.0
print(f"  [sum of leaf phases] {timed_sum:7.3f}  untimed "
      f"{total - acc.get('SETUP', total):7.3f} outside SETUP; "
      f"SETUP-internal untimed {acc.get('SETUP', 0) - timed_sum:7.3f}")
