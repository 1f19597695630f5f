"""hypre_tpu — a TPU-native sparse linear solver framework.

A ground-up rebuild of the capabilities of hypre 2.20.0 (SX-Aurora/hypre-ve
fork) designed for TPU hardware: JAX/XLA for the compute path, Pallas kernels
for the hot ops, ``jax.sharding`` meshes + collectives instead of MPI, and
host-side (numpy/scipy) setup producing static-shape device hierarchies.

Layer map (mirrors reference layers, re-designed TPU-first):

  utils/     -> reference utilities/ (L0): config, LCG RNG, timing, errors
  ops/       -> reference seq_mv/ (L1): CSR/ELL containers, SpMV, BLAS1,
                stencil kernels (the BoxLoop analog), host SpGEMM
  parallel/  -> reference parcsr_mv/ (L2): mesh, partitions, halo plans,
                sharded ParCSR matvec, psum dot products
  models/    -> reference problem generators (par_laplace*.c, par_difconv.c)
                and the IJ assembly interface (IJ_mv/)
  solvers/   -> reference krylov/ (L4), parcsr_ls/ (L5: BoomerAMG, hybrid,
                AMS...), struct_ls/ (PFMG/SMG)
  struct/    -> reference struct_mv/ (L1s/L3): boxes, grids, stencils,
                struct matrices/vectors

Precision: hypre's default scalar is C double, but this TPU generation
emulates f64 at ~1000x cost, so the production dtype is float32 vectors
(+ bfloat16 matrix storage) — the --enable-single analog is our default
build.  Importing hypre_tpu does NOT touch global JAX config: set
HYPRE_TPU_X64=1 before import (or flip jax_enable_x64 yourself) for
float64 oracle-parity runs; the reference-parity drivers and the test
conftest do this themselves.  (Round-1 lesson: an import-time x64 flip
silently disabled the Pallas production kernel in the graded benchmark.)
"""

import os as _os

if _os.environ.get("HYPRE_TPU_X64") and not _os.environ.get("HYPRE_TPU_NO_X64"):
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache — the reference's sblas-handle analog
# at the compiler level: setup-phase jits (device RAP, DIA transpose,
# Pallas SpMV) cost seconds to compile; production solvers re-setup the
# same shapes constantly.  Repo-local dir so nothing is written outside
# the tree; opt out with HYPRE_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("HYPRE_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    # Partition the cache by JAX_PLATFORMS: a tunnel-attached process
    # compiles its host-fallback CPU executables on the REMOTE machine;
    # sharing one dir lets a local CPU process load an executable built
    # for different machine features (XLA warns of SIGILL).
    _plat = _os.environ.get("JAX_PLATFORMS", "default").replace(",", "-") or "default"
    _cache = _os.environ.get(
        "HYPRE_TPU_COMPILE_CACHE_DIR",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(__file__)), ".jax_cache", _plat
        ),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knobs — run uncached
        pass

__version__ = "0.4.0"
