"""`sstruct` driver — mirrors the reference test/sstruct.c CLI subset.

Reference: test/sstruct.c (5.9 kLoC; reads grid-spec input files).  This
clone builds the built-in two-part 3D layout (the sstruct.in.default
shape: two equal boxes sharing an interface, 5/7-pt stencils per part,
interface couplings through the U-matrix).

  -n nx ny nz    per-part grid size (default 6 6 6)
  -d D           dimension (2|3)
  -solver ID     reference test/sstruct.c ids (sstruct.c:3702-3830):
                 0  Split + SMG      1  Split + PFMG    8  Split + Jacobi
                 3  SysPFMG
                 10 PCG + Split-SMG  11 PCG + Split-PFMG
                 13 PCG + SysPFMG    18 PCG + diag
                 19 PCG (no precond — no matching precond branch)
                 20 PCG + BoomerAMG (the ParCSR 20-block)
                 50-99 FAC family (sstruct_fac.c, infile mode)
  -tol T -max_iter N
Output: "Iterations = N" / "Final Relative Residual Norm = %e".
"""

from __future__ import annotations

import sys

import numpy as np


def build_two_part(nx, ny, nz, dim):
    import jax.numpy as jnp

    from ..ops.csr import CSRMatrix
    from ..sstruct import SStructGrid, SStructMatrix
    from ..struct import StructGrid, StructMatrix

    shape = (nx, ny, nz) if dim == 3 else (nx, ny)
    nd = len(shape)
    g = SStructGrid(parts=((StructGrid(shape),), (StructGrid(shape),)))
    ones = np.ones(shape)
    ent = {(0,) * nd: 2.0 * nd * ones}

    def off(d, s):
        o = [0] * nd
        o[d] = s
        return tuple(o)

    for d in range(nd):
        ent[off(d, -1)] = -ones
        ent[off(d, 1)] = -ones
    smats = {
        (0, 0, 0): StructMatrix.from_dict(ent, g.grid(0)),
        (1, 0, 0): StructMatrix.from_dict(ent, g.grid(1)),
    }
    # interface along the first axis: last x-plane of part 0 <-> first of part 1
    n = g.total_size
    offs = g.offsets()
    tail_shape = shape[1:]
    ntail = int(np.prod(tail_shape))
    rows, cols = [], []
    for j in range(ntail):
        a = offs[(0, 0)] + (nx - 1) * ntail + j
        bq = offs[(1, 0)] + j
        rows += [a, bq]
        cols += [bq, a]
    U = CSRMatrix.from_coo(rows, cols, [-1.0] * len(rows), (n, n))
    return g, SStructMatrix(g, smats, U)


def run(argv=None):
    import jax

    # reference-parity drivers compare against f64 oracle outputs; enable
    # x64 here (NOT at package import — see hypre_tpu/__init__.py)
    import os
    if not os.environ.get("HYPRE_TPU_NO_X64"):
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import hypre_tpu  # noqa: F401
    from ..solvers.krylov import GMRESOptions, PCGOptions, gmres, pcg
    from ..solvers.sstruct_ls import SplitOptions, SStructSplit
    from ..sstruct.matrix import sstruct_matvec
    from ..sstruct.vector import full

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

    nx, ny, nz = flag("-n", 3, [6, 6, 6], int) or [6, 6, 6]
    dim = flag("-d", 1, 3, int)
    solver_id = flag("-solver", 1, 19, int)
    tol = flag("-tol", 1, 1e-6)
    max_iter = flag("-max_iter", 1, 200, int)
    infile = flag("-in", 1, None, cast=str)
    rfac = flag("-r", 3, None, int)
    rhsone = flag("-rhsone")
    # sstruct.c:1721: the index space scales by refine*block*distribute
    # — -P and -b refine too (their box splits are an np>1 distribution
    # detail; np=1 here by contract)
    pfac = flag("-P", 3, None, int)
    bfac = flag("-b", 3, None, int)
    for extra in (pfac, bfac):
        if extra is not None:
            rfac = [a * b for a, b in zip(rfac or [1, 1, 1], extra)]

    if infile is not None:
        return _run_infile(infile, rfac, solver_id, tol, max_iter,
                           bool(rhsone))

    g, A = build_two_part(nx, ny, nz, dim)
    b = full(g, 1.0)

    if solver_id == 3:
        from ..solvers.sstruct_ls.sys_pfmg import SysPFMG, SysPFMGOptions

        blocks = {(0, 0): A.diag_block(0, 0)}
        spf = SysPFMG(blocks, g.grid(0), SysPFMGOptions(tol=tol, max_iter=max_iter))
        res = spf.solve((b[0][0],))
    elif solver_id in (0, 1, 8):
        ss = {0: "smg", 1: "pfmg", 8: "jacobi"}[solver_id]
        res = SStructSplit(A, SplitOptions(tol=tol, max_iter=max_iter, ssolver=ss)).solve(b)
    elif solver_id in (10, 11):
        ss = "smg" if solver_id == 10 else "pfmg"
        split = SStructSplit(A, SplitOptions(ssolver=ss))
        import jax

        M = lambda r: split._step(jax.tree.map(jnp.zeros_like, r), r)
        res = pcg(lambda x: sstruct_matvec(A, x), b, M=M,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    elif solver_id == 18:
        from ..sstruct.vector import pack_vector, unpack_vector

        dflat = []
        for p in range(g.nparts):
            for v in range(g.nvars(p)):
                dflat.append(np.asarray(A.diag_block(p, v).diagonal()).ravel())
        dinv = jnp.asarray(1.0 / np.concatenate(dflat))

        def M(r):
            return unpack_vector(dinv * pack_vector(r), g)

        res = pcg(lambda x: sstruct_matvec(A, x), b, M=M,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    elif 10 <= solver_id < 20 or solver_id == 40:
        # no matching precond branch in sstruct.c -> unpreconditioned
        # PCG (the default3d.jobs -solver 19 path); 40 kept as alias
        res = pcg(lambda x: sstruct_matvec(A, x), b,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    else:
        raise SystemExit(f"solver {solver_id} not implemented")

    print(f"Iterations = {int(res.num_iterations)}")
    print(f"Final Relative Residual Norm = {float(res.rel_residual_norm):e}")
    return res


def _run_infile(path, rfac, solver_id, tol, max_iter, rhsone):
    """Grid-spec file path (the reference's `-in FILE` mode): parse,
    apply -r refinement, assemble, solve.  RHS defaults to the cosine
    exact-solution protocol (sstruct.c:3355-3430, incl. the var-number-
    as-vartype quirk in the cosine box); -rhsone selects b = 1."""
    import jax
    import jax.numpy as jnp

    from ..ops.dia import freeze_auto, spmv as op_spmv
    from ..ops.csr import CSRMatrix
    from ..solvers.krylov import PCGOptions, pcg
    from ..sstruct.assemble import AssembledSystem
    from ..sstruct.infile import map_refinement, read_infile

    data = read_infile(path)
    if rfac:
        map_refinement(data, list(rfac))

    if 50 <= solver_id < 100:
        # sstruct_fac solver family: FAC with SysPFMG RB-GS relaxation
        # (relax 2 for id>90, sstruct_fac.c:1996-2002), 20 cycles, 1e-6
        from ..solvers.sstruct_ls.fac_amr import FACAMROptions, FACAMRSolver

        # the reference driver hard-sets 20 cycles / 1e-6
        # (sstruct_fac.c:1990-1991)
        fac = FACAMRSolver(data, FACAMROptions(tol=1.0e-6, max_iter=20))
        x0 = {p: np.ones(fac.shape[p]) for p in range(fac.nparts)}
        res = fac.solve(x_parts=x0)
        print(f"Iterations = {int(res.num_iterations)}")
        print(
            "Final Relative Residual Norm = "
            f"{float(res.rel_residual_norm):e}"
        )
        return res

    sysm = AssembledSystem(data)
    As = sysm.A.to_scipy()
    n = As.shape[0]

    if rhsone:
        b = np.ones(n)
    else:
        x_exact = np.zeros(n)
        nd = data.ndim
        for p in range(data.nparts):
            ilo, iup = data.extents[p]
            clo, cup = ilo.point()[:nd], iup.point()[:nd]
            for v in range(len(data.vartypes[p])):
                # sstruct.c passes the var NUMBER as the vartype here
                from ..sstruct.assemble import _var_box

                vlo, vup = _var_box(clo, cup, min(v, 7), nd)
                scale = (p + 1.0) * (v + 1.0)
                import itertools as _it

                for idx in _it.product(*[
                        range(vlo[d], vup[d] + 1) for d in range(nd)]):
                    gidx = sysm.gid(p, v, list(idx) + [0] * (3 - nd))
                    if gidx is not None:
                        x_exact[gidx] = scale * np.cos(sum(idx) / 10.0)
        b = As @ x_exact

    E = freeze_auto(CSRMatrix.from_scipy(As))
    op = lambda x: op_spmv(E, x)
    bj = jnp.asarray(b)
    if solver_id in (0, 1, 8) or solver_id in (10, 11):
        # Split with SMG (0) / PFMG (1) / Jacobi (8) sub-solves on the
        # assembled S+U system, standalone or as a PCG preconditioner
        # (10/11) — reference test/sstruct.c:3702-3780 id semantics.
        # Cross-variable different-shape couplings live in U and are
        # lagged, exactly hypre's Split treatment of non-diagonal-block
        # couplings (HYPRE_sstruct_split.c:379-404 y += Nx).
        import jax as _jax

        from ..solvers.sstruct_ls import SplitOptions, SStructSplit
        from ..sstruct.vector import pack_vector, unpack_vector

        ss = {0: "smg", 1: "pfmg", 8: "jacobi", 10: "smg",
              11: "pfmg"}[solver_id]
        b_parts = unpack_vector(bj, sysm.grid)
        if solver_id in (0, 1, 8):
            split = SStructSplit(
                sysm.A, SplitOptions(tol=tol, max_iter=max_iter,
                                     ssolver=ss)
            )
            res = split.solve(b_parts)
        else:
            split = SStructSplit(sysm.A, SplitOptions(ssolver=ss))
            M = lambda r: pack_vector(split._step(
                _jax.tree.map(jnp.zeros_like, r), r))
            res = pcg(
                lambda x: op(x), bj,
                M=lambda r: M(unpack_vector(r, sysm.grid)),
                opts=PCGOptions(tol=tol, max_iter=max_iter,
                                two_norm=True),
            )
        print(f"Iterations = {int(res.num_iterations)}")
        print(
            "Final Relative Residual Norm = "
            f"{float(res.rel_residual_norm):e}"
        )
        return res
    if solver_id == 18:
        dinv = jnp.asarray(1.0 / As.diagonal())
        res = pcg(op, bj, M=lambda r: dinv * r,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    elif 10 <= solver_id < 20:
        # no matching precond branch -> plain PCG (sstruct.c PCG block;
        # default3d.jobs runs -solver 19 this way)
        res = pcg(op, bj,
                  opts=PCGOptions(tol=tol, max_iter=max_iter,
                                  two_norm=True))
    elif solver_id == 20:
        # PCG + BoomerAMG on the flattened composite (object_type
        # PARCSR; the VE-stubbed oracle build aborts here, so the
        # pinned count is a framework regression, not [REF])
        from ..solvers.amg import BoomerAMG, BoomerAMGOptions

        amg = BoomerAMG(
            CSRMatrix.from_scipy(As),
            BoomerAMGOptions(coarsen_type="pmis", interp_type="classical",
                             P_max_elmts=4, relax_down=18, relax_up=18),
        )
        res = pcg(op, bj, M=amg.precond,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    else:
        res = pcg(op, bj,
                  opts=PCGOptions(tol=tol, max_iter=max_iter, two_norm=True))
    print(f"Iterations = {int(res.num_iterations)}")
    print(f"Final Relative Residual Norm = {float(res.rel_residual_norm):e}")
    return res


if __name__ == "__main__":
    run()
