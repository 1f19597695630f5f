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
    # -P/-b decomposition (test/struct.c semantics): global extent =
    # n * b * P per dim; each of the first prod(P) virtual ranks owns
    # prod(b) boxes; -np ranks beyond prod(P) own NOTHING (emptyproc).
    Pgrid = flag("-P", 3, None, int)
    Bblock = flag("-b", 3, [1, 1, 1], int) or [1, 1, 1]
    vnp = flag("-np", 1, 0, int)
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

    def off(d, s):
        o = [0] * dim
        o[d] = s
        return tuple(o)

    if Pgrid is not None:
        # multi-box path: distribute, build per-box data, run a
        # multi-box matvec consistency check, assemble canonical
        from ..struct.box import distribute_PB
        from ..struct.multibox import (
            MultiBoxGrid,
            MultiBoxVector,
            multibox_matvec,
        )

        Pg = list(Pgrid)[:dim]
        Bb = list(Bblock)[:dim]
        nloc = [nx, ny, nz][:dim]
        owners, gbox = distribute_PB(tuple(nloc), tuple(Pg), tuple(Bb),
                                     vnp or int(np.prod(Pg)))
        shape = gbox.shape
        grid_mb = MultiBoxGrid([b for _, b in owners])
        coefs = [cx, cy, cz][:dim]
        diag_val = 2 * sum(coefs)
        ent_mb = {(0,) * dim: {}}
        for d, c in enumerate(coefs):
            ent_mb[off(d, -1)] = {}
            ent_mb[off(d, 1)] = {}
        for i in grid_mb.nonempty:
            bshape = grid_mb.boxes[i].shape
            ent_mb[(0,) * dim][i] = diag_val * np.ones(bshape)
            for d, c in enumerate(coefs):
                ent_mb[off(d, -1)][i] = -c * np.ones(bshape)
                ent_mb[off(d, 1)][i] = -c * np.ones(bshape)
        # canonical assembly through the box maps; non-rectangular
        # unions embed exactly (identity exterior block — see
        # struct/multibox.py to_struct_matrix)
        from ..struct.multibox import to_struct_matrix

        ent, inside = to_struct_matrix(grid_mb, ent_mb)
        # the multi-box matvec (ghost plans from box intersections)
        # must agree with the canonical stencil apply on the union
        # (outside the union the embedded operator is identity)
        rng = np.random.default_rng(0)
        xt = rng.standard_normal(shape) * inside
        xs = MultiBoxVector.from_global(grid_mb, xt)
        y_mb = np.asarray(multibox_matvec(grid_mb, ent_mb, xs).to_global())
        A = StructMatrix.from_dict(
            {o: jnp.asarray(v) for o, v in ent.items()}, StructGrid(shape)
        )
        y_ref = np.asarray(struct_matvec(A, jnp.asarray(xt))) * inside
        np.testing.assert_allclose(y_mb, y_ref, rtol=1e-12, atol=1e-12)
        b = jnp.asarray(np.ones(shape) * inside)
    else:
        ones = np.ones(shape)
        ent = {(0,) * dim: 2 * (cx + cy + (cz if dim == 3 else 0)) * ones}
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
