"""Cyclic reduction — direct solver for 1-D (tridiagonal) struct systems.

Reference: struct_ls/cyclic_reduction.c (1256 LoC — the 1-D coarsest-
level direct solver used under SMG).

TPU design: PARALLEL cyclic reduction (PCR): log2(n) vectorized
elimination sweeps, each a fused elementwise pass over all lines at
once — batched over any leading dims, so a [ny, nz] stack of lines
solves in the same log-depth.  No sequential Thomas recursion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...struct.matrix import StructMatrix


def pcr_solve_batched(lower, diag, upper, rhs):
    """Solve tridiagonal systems along the LAST axis via PCR.

    lower/diag/upper/rhs: [..., n]; lower[...,0] and upper[...,n-1]
    ignored (out of band).  The log2(n) elimination sweeps run in a
    fori_loop with dynamic shifts (an unrolled version bloats the
    surrounding SMG graphs ~7x and blows up compile time).
    """
    n = rhs.shape[-1]
    a0 = jnp.concatenate([jnp.zeros_like(lower[..., :1]), lower[..., 1:]], -1)
    c0 = jnp.concatenate([upper[..., :-1], jnp.zeros_like(upper[..., :1])], -1)

    steps = max(1, int(np.ceil(np.log2(max(n, 2)))))
    idx = jnp.arange(n)

    def body(s, state):
        a, b, c, d = state
        k = jnp.left_shift(jnp.int32(1), s.astype(jnp.int32))

        def sh(x, off):
            return jnp.roll(x, off, axis=-1)

        ok_m = idx - k >= 0
        ok_p = idx + k < n
        bm = jnp.where(sh(b, k) == 0, 1.0, sh(b, k))
        bp = jnp.where(sh(b, -k) == 0, 1.0, sh(b, -k))
        alpha = jnp.where(ok_m, -a / bm, 0.0)
        gamma = jnp.where(ok_p, -c / bp, 0.0)

        b = b + alpha * sh(c, k) + gamma * sh(a, -k)
        d = d + alpha * sh(d, k) + gamma * sh(d, -k)
        a = alpha * sh(a, k)
        c = gamma * sh(c, -k)
        return a, b, c, d

    a, b, c, d = jax.lax.fori_loop(0, steps, body, (a0, diag, c0, rhs))
    return d / jnp.where(b == 0, 1.0, b)


class CyclicReduction:
    """Direct solve of a 1-D StructMatrix (3-point stencil)."""

    def __init__(self, A: StructMatrix):
        shape = tuple(A.shape)
        assert sum(s > 1 for s in shape) <= 1, "cyclic reduction is 1-D"
        self.axis = int(np.argmax(shape))
        self.A = A
        nd = len(shape)

        def entry(off_val):
            off = [0] * nd
            off[self.axis] = off_val
            off = tuple(off)
            if off in A.offsets:
                return jnp.moveaxis(A.entry(off), self.axis, -1)
            return jnp.zeros(shape[self.axis])[None]

        self._lower = entry(-1)
        self._diag = entry(0)
        self._upper = entry(1)

    def solve(self, b):
        bm = jnp.moveaxis(b, self.axis, -1)
        x = pcr_solve_batched(self._lower, self._diag, self._upper, bm)
        return jnp.moveaxis(x, -1, self.axis)
