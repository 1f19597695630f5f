"""Krylov solver plumbing — the vtable analog.

The reference writes each Krylov method once against a function-pointer
vtable {Matvec, InnerProd, Axpy, ...} (krylov/pcg.h:49-70) and
instantiates it per matrix family.  The TPU-native equivalent: solvers
take `A` and `M` as callables and treat vectors as arbitrary pytrees,
with inner products/axpys defined tree-wide below.  Local arrays, sharded
global arrays (GSPMD inserts the psum), struct vectors (pytrees of box
arrays), and sstruct vectors (pytrees of parts) all reuse the same solver
body unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


Vec = Any  # any pytree of arrays
Operator = Callable[[Vec], Vec]


def tdot(x: Vec, y: Vec):
    """<x, y> over every leaf (the InnerProd vtable slot)."""
    with jax.named_scope("ALL_REDUCE"):
        parts = jax.tree.map(lambda a, b: jnp.vdot(a, b), x, y)
        return jax.tree.reduce(jnp.add, parts)


def taxpy(alpha, x: Vec, y: Vec) -> Vec:
    return jax.tree.map(lambda a, b: b + alpha * a, x, y)


def tscale(alpha, x: Vec) -> Vec:
    return jax.tree.map(lambda a: alpha * a, x)


def tsub(x: Vec, y: Vec) -> Vec:
    return jax.tree.map(jnp.subtract, x, y)


def tadd(x: Vec, y: Vec) -> Vec:
    return jax.tree.map(jnp.add, x, y)


def tzeros_like(x: Vec) -> Vec:
    return jax.tree.map(jnp.zeros_like, x)


def tnorm2(x: Vec):
    return jnp.sqrt(tdot(x, x))


def identity_precond(r: Vec) -> Vec:
    return r


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolverResult:
    """What hypre exposes via GetNumIterations / GetFinalRelativeResidualNorm
    / logging>1 residual histories (pcg.h:139-141)."""

    x: Vec
    num_iterations: jax.Array  # int
    rel_residual_norm: jax.Array
    converged: jax.Array  # bool
    res_norms: jax.Array  # per-iteration ||r||, NaN beyond num_iterations
