"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the same XLA
collectives code paths), mirroring how the reference tests distributed
behavior with multi-rank MPI on one box (SURVEY §4.2).
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. a TPU tunnel):
# tests validate math + sharding, the benchmark exercises the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compilation cache in tests: entries written by other
# hosts/backends can load with mismatched machine features (XLA warns of
# SIGILL risk) and cached-vs-fresh compiles may differ in fp fusion,
# breaking bitwise assertions.
os.environ["HYPRE_TPU_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by a pytest plugin, so the env var alone is
# not enough — set the config directly (backend is not yet initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
