"""Sharded vectors and reductions.

Reference: parcsr_mv/par_vector.c — ParVector = partitioning + local
vector; InnerProd = local dot + MPI_Allreduce (:481-495); mass variants
batch k dots into one reduction (:533-579).

TPU design: a ParVector is simply a padded global jax.Array with a
NamedSharding; jnp.vdot under GSPMD emits the psum automatically, so the
Krylov layer needs no distribution-aware code.  Helpers below exist for
symmetry with the reference API and for mass (batched) reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import AXIS


class ParVector:
    def __init__(self, mesh, n: int, axis: str = AXIS):
        self.mesh = mesh
        self.axis = axis
        self.n = n
        self.sharding = NamedSharding(mesh, P(axis))

    def from_host(self, v, n_padded: int) -> jax.Array:
        out = np.zeros(n_padded, dtype=np.asarray(v).dtype)
        out[: self.n] = np.asarray(v)
        return jax.device_put(out, self.sharding)


def par_dot(x: jax.Array, y: jax.Array):
    with jax.named_scope("ALL_REDUCE"):
        return jnp.vdot(x, y)


def par_norm(x: jax.Array):
    return jnp.sqrt(par_dot(x, x))


def par_mass_dot(x: jax.Array, Ys: jax.Array):
    """k dots against a stacked [k, n] bundle -> one fused reduction."""
    with jax.named_scope("ALL_REDUCE"):
        return Ys @ x
