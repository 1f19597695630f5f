"""Device mesh helpers (the MPI communicator analog).

The reference's inter-process world is an MPI communicator over which
matrices are row-partitioned (SURVEY §2.14).  Here it is a 1-D
jax.sharding.Mesh whose single axis plays the role of ranks; collectives
ride ICI (psum for dots, ppermute for halos).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh
from ..utils.errors import arg_error


AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise arg_error(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_nd(shape, axes=None) -> Mesh:
    """Multi-axis process grid (the struct -P px py pz analog): shape
    (p0, p1[, p2]) arranges prod(shape) devices into an N-D mesh whose
    axes shard distinct grid dimensions (SURVEY §2.14-1)."""
    devs = jax.devices()
    n = int(np.prod(shape))
    if n > len(devs):
        raise arg_error(f"requested {n} devices, have {len(devs)}")
    axes = tuple(axes) if axes else tuple(f"{AXIS}{d}" for d in range(len(shape)))
    return Mesh(np.array(devs[:n]).reshape(shape), axes)


def default_mesh() -> Mesh:
    return make_mesh()
