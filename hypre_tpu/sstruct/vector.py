"""SStruct vectors: pytrees of per-(part,var) grid arrays.

Reference: sstruct_mv/sstruct_vector.c.  The Krylov layer operates on
arbitrary pytrees (solvers/krylov/common.py), so an SStructVector is
simply a nested tuple — no vtable instantiation needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .grid import SStructGrid

# an SStructVector is tuple[tuple[Array, ...], ...] indexed [part][var]
SStructVector = tuple


def zeros(grid: SStructGrid, dtype=jnp.float64) -> SStructVector:
    return tuple(
        tuple(jnp.zeros(g.shape, dtype=dtype) for g in pv) for pv in grid.parts
    )


def full(grid: SStructGrid, value, dtype=jnp.float64) -> SStructVector:
    return tuple(
        tuple(jnp.full(g.shape, value, dtype=dtype) for g in pv)
        for pv in grid.parts
    )


def pack_vector(x: SStructVector):
    """Concatenate to the global unknown ordering (for the U-matrix)."""
    return jnp.concatenate(
        [xv.ravel() for pv in x for xv in pv]
    )


def unpack_vector(flat, grid: SStructGrid) -> SStructVector:
    out = []
    acc = 0
    for pv in grid.parts:
        row = []
        for g in pv:
            row.append(flat[acc : acc + g.size].reshape(g.shape))
            acc += g.size
        out.append(tuple(row))
    return tuple(out)
