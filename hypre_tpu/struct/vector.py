"""Struct vector helpers (reference: struct_mv/struct_vector.c,
struct_innerprod.c — BoxLoop reduction + Allreduce; here one fused
jnp.vdot that GSPMD turns into local-reduce + psum when sharded)."""

import jax
import jax.numpy as jnp


def struct_inner_prod(x, y):
    with jax.named_scope("ALL_REDUCE"):
        return jnp.vdot(x, y)
