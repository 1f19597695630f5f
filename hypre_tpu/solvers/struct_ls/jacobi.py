"""Struct Jacobi solver (reference: struct_ls/jacobi.c — pointwise
Jacobi iteration as a standalone StructSolver, used by SStruct Split)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...struct.matrix import StructMatrix, struct_matvec
from ..krylov.common import SolverResult
from .relax import point_jacobi


@dataclasses.dataclass(frozen=True)
class StructJacobiOptions:
    tol: float = 1e-6
    max_iter: int = 1000
    weight: float = 1.0


class StructJacobi:
    def __init__(self, A: StructMatrix, opts: StructJacobiOptions = StructJacobiOptions()):
        self.A = A
        self.opts = opts
        import numpy as np

        diag = np.asarray(A.diagonal())
        self.dinv = jnp.asarray(
            np.where(diag == 0, 0.0, 1.0 / np.where(diag == 0, 1, diag))
        )

    def solve(self, b, x0=None) -> SolverResult:
        o = self.opts
        x = jnp.zeros_like(b) if x0 is None else x0
        b_dot_b = jnp.vdot(b, b)
        eps = o.tol**2
        norms = jnp.full(o.max_iter + 1, jnp.nan, dtype=b.dtype)

        def cond(st):
            i, x, rr, done, norms = st
            return (i < o.max_iter) & (~done)

        def body(st):
            i, x, rr, done, norms = st
            x = point_jacobi(self.A, self.dinv, x, b, o.weight)
            r = b - struct_matvec(self.A, x)
            rr = jnp.vdot(r, r)
            norms = norms.at[i + 1].set(jnp.sqrt(rr))
            done = rr / jnp.where(b_dot_b > 0, b_dot_b, 1.0) < eps
            return (i + 1, x, rr, done, norms)

        i, x, rr, done, norms = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), x, jnp.asarray(jnp.inf, b.dtype), jnp.asarray(False), norms)
        )
        rel = jnp.sqrt(rr / jnp.where(b_dot_b > 0, b_dot_b, 1.0))
        return SolverResult(x, i, rel, done, norms)
