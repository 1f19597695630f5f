"""`struct` driver — mirrors the reference test/struct.c CLI subset.

Reference: test/struct.c (solver IDs at :536-599).  Supported:
  -n nx ny nz      grid size (default 10 10 10)
  -c cx cy cz      stencil coefficients
  -d D             dimension (2 or 3)
  -solver ID       1 PFMG, 3 PFMG const-coeff (treated as 1),
                   8 Jacobi, 10 CG+SMG (->CG+PFMG), 11 CG+PFMG,
                   17 CG+diag, 18 GMRES+diag, 19 CG (no prec),
                   25 hybrid
  -v pre post      relaxation sweeps
  -relax K         0/1 Jacobi (weighted), 2/3 red-black GS
  -skip K          PFMG skip-relax
  -tol T  -max_iter N
Output: "Iterations = N" / "Final Relative Residual Norm = %e".
"""

from __future__ import annotations

import sys

import numpy as np


def run(argv=None):
    import jax

    # reference-parity drivers compare against f64 oracle outputs; enable
    # x64 here (NOT at package import — see hypre_tpu/__init__.py)
    import os
    if not os.environ.get("HYPRE_TPU_NO_X64"):
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import hypre_tpu  # noqa: F401
    from ..struct import StructGrid, StructMatrix, struct_matvec
    from ..solvers.struct_ls import (
        PFMG,
        PFMGOptions,
        StructHybrid,
        StructHybridOptions,
        StructJacobi,
        StructJacobiOptions,
    )
    from ..solvers.krylov import GMRESOptions, PCGOptions, gmres, pcg

    a = list(argv if argv is not None else sys.argv[1:])

    def flag(name, nvals=0, default=None, cast=float):
        if name in a:
            i = a.index(name)
            if nvals == 0:
                a.pop(i)
                return True
            vals = [cast(x) for x in a[i + 1 : i + 1 + nvals]]
            del a[i : i + 1 + nvals]
            return vals if nvals > 1 else vals[0]
        return default

    nx, ny, nz = flag("-n", 3, [10, 10, 10], int) or [10, 10, 10]
    cx, cy, cz = flag("-c", 3, [1.0, 1.0, 1.0])
    dim = flag("-d", 1, 3, int)
    solver_id = flag("-solver", 1, 0, int)
    n_pre, n_post = flag("-v", 2, [1, 1], int) or [1, 1]
    relax = flag("-relax", 1, 1, int)
    skip = flag("-skip", 1, 0, int)
    tol = flag("-tol", 1, 1e-6)
    max_iter = flag("-max_iter", 1, 200, int)

    if dim == 2:
        nz = 1
        cz = 0.0
    shape = (nx, ny, nz) if dim == 3 else (nx, ny)
    ones = np.ones(shape)
    ent = {(0,) * dim: 2 * (cx + cy + (cz if dim == 3 else 0)) * ones}

    def off(d, s):
        o = [0] * dim
        o[d] = s
        return tuple(o)

    for d, c in enumerate([cx, cy, cz][:dim]):
        ent[off(d, -1)] = -c * ones
        ent[off(d, 1)] = -c * ones
    A = StructMatrix.from_dict(ent, StructGrid(shape))
    b = jnp.ones(shape)

    pf_opts = PFMGOptions(
        tol=tol, max_iter=max_iter, relax_type=relax,
        num_pre_relax=n_pre, num_post_relax=n_post, skip_relax=skip,
    )

    if solver_id == 0:  # SMG
        from ..solvers.struct_ls import SMG, SMGOptions

        res = SMG(A, SMGOptions(tol=tol, max_iter=max_iter,
                                num_pre_relax=n_pre, num_post_relax=n_post)).solve(b)
    elif solver_id == 2:  # SparseMSG (struct.c solver 2)
        from ..solvers.struct_ls import SparseMSG, SparseMSGOptions

        res = SparseMSG(A, SparseMSGOptions(tol=tol, max_iter=max_iter,
                                            num_pre=n_pre, num_post=n_post)).solve(b)
    elif solver_id in (1, 3, 4):  # PFMG family
        res = PFMG(A, pf_opts).solve(b)
    elif solver_id == 8:
        res = StructJacobi(A, StructJacobiOptions(tol=tol, max_iter=max_iter)).solve(b)
    elif solver_id == 10:  # CG + SMG
        from ..solvers.struct_ls import SMG, SMGOptions

        sm = SMG(A, SMGOptions(num_pre_relax=n_pre, num_post_relax=n_post))
        res = pcg(lambda x: struct_matvec(A, x), b, M=sm.precond,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    elif solver_id == 11:
        pf = PFMG(A, PFMGOptions(relax_type=relax, num_pre_relax=n_pre,
                                 num_post_relax=n_post, skip_relax=skip))
        res = pcg(lambda x: struct_matvec(A, x), b, M=pf.precond,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    elif solver_id == 17:
        # two-step Jacobi preconditioner (struct.c:1643-1652)
        import numpy as _np

        dinv = jnp.asarray(1.0 / _np.asarray(A.diagonal()))

        def two_step_jacobi(r):
            x = dinv * r
            return x + dinv * (r - struct_matvec(A, x))

        res = pcg(lambda x: struct_matvec(A, x), b, M=two_step_jacobi,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    elif solver_id == 18:
        # diagonal-scaled PCG (struct.c:1656)
        import numpy as _np

        dinv = jnp.asarray(1.0 / _np.asarray(A.diagonal()))
        res = pcg(lambda x: struct_matvec(A, x), b, M=lambda r: dinv * r,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    elif solver_id == 19:
        res = pcg(lambda x: struct_matvec(A, x), b,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    elif solver_id in (30, 31, 38, 39):
        # GMRES family (struct.c solver_id 30-39)
        import numpy as _np

        if solver_id == 30:
            from ..solvers.struct_ls import SMG, SMGOptions

            sm = SMG(A, SMGOptions(num_pre_relax=n_pre, num_post_relax=n_post))
            M = sm.precond
        elif solver_id == 31:
            pf = PFMG(A, PFMGOptions(relax_type=relax, num_pre_relax=n_pre,
                                     num_post_relax=n_post, skip_relax=skip))
            M = pf.precond
        elif solver_id == 38:
            dinv = jnp.asarray(1.0 / _np.asarray(A.diagonal()))
            M = lambda r: dinv * r
        else:
            M = None
        res = gmres(lambda x: struct_matvec(A, x), b, M=M,
                    opts=GMRESOptions(tol=tol, max_iter=max_iter))
    elif solver_id == 25:
        res = StructHybrid(A, StructHybridOptions(tol=tol)).solve(b)
    else:
        raise SystemExit(f"solver {solver_id} not implemented")

    print(f"Iterations = {int(res.num_iterations)}")
    print(f"Final Relative Residual Norm = {float(res.rel_residual_norm):e}")
    return res


if __name__ == "__main__":
    run()
