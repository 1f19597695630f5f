"""Distributed struct grids — GSPMD sharding of stencil computations.

Reference analog: struct_mv's box distribution + struct CommPkg ghost
exchanges (struct_communication.c) and the ComputePkg interior/boundary
overlap (computation.c).

TPU design: struct matvecs are shifted static slices over dense arrays;
under GSPMD a sharded array's shifted slice IS a halo exchange — XLA
partitions the slice and inserts the collective-permute for the ghost
slab, then overlaps it with the interior compute via the latency-hiding
scheduler.  So the entire struct stack (matvec, PFMG/SMG cycles,
restriction/interpolation) distributes by ANNOTATION ONLY: shard the
vectors (and the coefficient arrays congruently) along grid axes and jit.
Validated: sharded PFMG iterations and solutions are bitwise-identical
to serial (tests/test_par_struct.py), the smgbase3d/pfmgbase3d
cross-decomposition contract.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..struct.matrix import StructMatrix
from .mesh import AXIS


def shard_struct(A: StructMatrix, x_arrays, mesh: Mesh, axis_name=AXIS,
                 grid_axis=0):
    """Place a StructMatrix and vectors on the mesh, sharded along one
    or several grid axes (the struct -P px py pz process-grid analog:
    pass a MULTI-AXIS mesh from make_mesh_nd with matching tuples of
    axis names / grid axes).  Returns (A_sharded, [x_sharded...])."""
    ndim = len(A.shape)
    axes = axis_name if isinstance(axis_name, (tuple, list)) else (axis_name,)
    gaxes = grid_axis if isinstance(grid_axis, (tuple, list)) else (grid_axis,)
    spec_vec = [None] * ndim
    for an, ga in zip(axes, gaxes):
        spec_vec[ga] = an
    sh_vec = NamedSharding(mesh, P(*spec_vec))
    sh_mat = NamedSharding(mesh, P(None, *spec_vec))
    A_sh = dataclasses.replace(A, data=jax.device_put(A.data, sh_mat))
    xs = [jax.device_put(np.asarray(v), sh_vec) for v in x_arrays]
    return A_sh, xs


def vector_sharding(mesh: Mesh, ndim: int, axis_name=AXIS, grid_axis=0):
    axes = axis_name if isinstance(axis_name, (tuple, list)) else (axis_name,)
    gaxes = grid_axis if isinstance(grid_axis, (tuple, list)) else (grid_axis,)
    spec = [None] * ndim
    for an, ga in zip(axes, gaxes):
        spec[ga] = an
    return NamedSharding(mesh, P(*spec))
