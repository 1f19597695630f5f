"""Struct smoothers: point Jacobi and red-black Gauss-Seidel.

Reference: struct_ls/point_relax.c (weighted pointwise relaxation with
ComputePkg overlap), struct_ls/red_black_gs.c (red/black ordered GS —
parity coloring of (i+j+k), red sweep then black sweep).

TPU design: each half-sweep is one fused stencil kernel + parity mask —
the coloring makes GS order-independent within a color, which is exactly
why hypre offers it for structured grids; no wavefront scheduling needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...struct.matrix import StructMatrix, struct_matvec


def _parity_mask(shape, parity: int):
    idx = sum(
        np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    )
    return jnp.asarray((idx % 2) == parity)


def point_jacobi(A: StructMatrix, dinv, u, f, weight=1.0):
    with jax.named_scope("RELAX"):
        r = f - struct_matvec(A, u)
        return u + weight * dinv * r


def red_black_gs(A: StructMatrix, dinv, u, f, red_mask, pre: bool = True):
    """One RB (pre) or BR (post) sweep (red_black_gs.c ordering)."""
    with jax.named_scope("RELAX"):
        order = (red_mask, ~red_mask) if pre else (~red_mask, red_mask)
        for mask in order:
            r = f - struct_matvec(A, u)
            u = jnp.where(mask, u + dinv * r, u)
        return u


def pointset_mask(shape, stride, index):
    """Boolean mask of the axis-strided pointset {x : x_d % stride_d ==
    index_d} — the hypre_PointRelaxSetPointset geometry
    (point_relax.c:1592 generic engine; pointsets are strided
    sublattices per dimension)."""
    grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    m = np.ones(shape, dtype=bool)
    for g, st, ix in zip(grids, stride, index):
        m &= (g % int(st)) == int(ix)
    return jnp.asarray(m)


def point_relax(A: StructMatrix, dinv, u, f, pointsets, weight=1.0):
    """Generic weighted pointwise relaxation over an ordered list of
    pointset masks (point_relax.c hypre_PointRelax): each pointset
    updates from a FRESH residual, so the sweep is a multicolor
    Gauss-Seidel whose colors are the pointsets; one full-lattice
    pointset degenerates to weighted Jacobi, the 2-color parity pair is
    red-black GS.  `pointsets`: boolean masks (see pointset_mask) or
    (stride, index) tuples resolved against u's shape."""
    with jax.named_scope("RELAX"):
        for ps in pointsets:
            mask = (ps if hasattr(ps, "dtype")
                    else pointset_mask(u.shape, *ps))
            r = f - struct_matvec(A, u)
            u = jnp.where(mask, u + weight * dinv * r, u)
        return u
