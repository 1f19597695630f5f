"""Level-1 vector ops (reference: seq_mv/vector.c, vector_batched.c).

These are thin jnp wrappers — XLA fuses them into neighboring ops, which
is the TPU-native version of the reference's hand-fused chunked OpenMP
reductions (vector.c:466-606) and the batched mass-axpy/mass-dot kernels
(vector_batched.c:15-249): mass ops take a stacked [k, n] array so k dot
products become one reduction (one psum when sharded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def axpy(alpha, x, y):
    return y + alpha * x


def inner_prod(x, y):
    with jax.named_scope("BLAS1"):
        return jnp.vdot(x, y)


def norm2(x):
    return jnp.sqrt(inner_prod(x, x))


def scale(alpha, x):
    return alpha * x


def set_constant(x, c):
    return jnp.full_like(x, c)


def mass_inner_prod(x, Ys):
    """k dots <x, Ys[i]> in one fused reduction; Ys is [k, n]."""
    with jax.named_scope("BLAS1"):
        return Ys @ x


def mass_axpy(alphas, Xs, y):
    """y += sum_i alphas[i] * Xs[i]; Xs is [k, n] (vector_batched.c:15)."""
    return y + alphas @ Xs
