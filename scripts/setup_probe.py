"""Setup-phase timing probe: python scripts/setup_probe.py [size] [ds] [dr]
ds/dr: device_setup / device_rap ("on"/"off", default off)."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
from hypre_tpu.utils import tune_host_malloc
tune_host_malloc()
from hypre_tpu.models import laplacian_7pt
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
from hypre_tpu.utils.timing import GLOBAL_TIMER

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
ds = len(sys.argv) > 2 and sys.argv[2] == "on"
dr = len(sys.argv) > 3 and sys.argv[3] == "on"
jax.block_until_ready(jax.device_put(np.zeros(8, dtype=np.float32)))
t0 = time.perf_counter(); A = laplacian_7pt(nx, nx, nx); gen = time.perf_counter() - t0
interp = "ext+i" if nx < 96 else "classical"
t0 = time.perf_counter()
amg = BoomerAMG(A, BoomerAMGOptions(
    coarsen_type="pmis", interp_type=interp, P_max_elmts=4,
    relax_down=18, relax_up=18, dtype="float32", mat_dtype="bfloat16",
    nongalerkin_tol=0.02, relocate_level2=nx < 224, lattice_shape=(nx, nx, nx),
    device_setup=ds, device_rap=dr))
t_host = time.perf_counter() - t0
for lvl in amg.levels:
    jax.block_until_ready(jax.tree.leaves(lvl.A)[0])
setup = time.perf_counter() - t0
print(f"n={nx}^3 gen={gen:.2f}s setup={setup:.2f}s (pre-sync {t_host:.2f}s) levels={amg.num_levels} opcx={amg.operator_complexity():.3f}")
print(GLOBAL_TIMER.summary())
