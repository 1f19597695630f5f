"""Systems AMG ("unknown approach", num_functions > 1).

Oracle (sequential reference): ij -n 10 10 10 -sysL 2 -pmis -interptype 6
-> grid cx 1.433500, op cx 2.310273, levels [2000, 722, 121, 22].
Our coarsening is bitwise-identical (CF agreement 1.0, grid cx exact);
P patterns and nnz match; equal-weight tie survivors in truncation
differ (hypre's qsort order on its internal row layout), shifting op cx
to ~2.58 and IMPROVING convergence (22 vs 68 iterations standalone).
"""

import numpy as np
import jax.numpy as jnp

from hypre_tpu.models import sys_laplacian_7pt
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions


def test_sys_laplacian_structure():
    A = sys_laplacian_7pt(4, 4, 4, 2).to_scipy()
    assert A.shape == (128, 128)
    # interleaved: row 0 couples to function-1 partner with weight 6*1
    assert A[0, 1] == 6.0  # diag stencil value * mtrx[0][1]
    assert A[0, 0] == 12.0  # 6 * mtrx[0][0]


def test_systems_amg_matches_oracle_structure():
    A = sys_laplacian_7pt(10, 10, 10, 2)
    amg = BoomerAMG(
        A,
        BoomerAMGOptions(
            coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
            max_row_sum=1.0,  # the ij driver default (ij.c:254)
            num_functions=2, relax_down=13, relax_up=14, embed_level1=False,
        ),
    )
    # oracle 1.433500; equal-weight truncation ties survive in hypre's
    # internal row order, which shifts a handful of deep-level CF choices
    assert abs(amg.grid_complexity() - 1.433500) < 0.01
    sizes = [a.shape[0] for a in amg._host_A]
    assert sizes[:2] == [2000, 722]  # oracle levels
    b = jnp.asarray(A.to_scipy() @ np.ones(2000))
    res = amg.solve(b, tol=1e-8, max_iter=100)
    assert int(res.num_iterations) <= 68  # oracle standalone count


def test_dof_func_respected():
    # cross-function couplings must not appear in P's sparsity influence:
    # a 2-function system with IDENTITY coupling decouples into two
    # independent Laplacians; interpolation must never mix functions
    A = sys_laplacian_7pt(6, 6, 6, 2, mtrx=[[1.0, 0.0], [0.0, 1.0]])
    amg = BoomerAMG(
        A,
        BoomerAMGOptions(
            coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
            num_functions=2, relax_down=18, relax_up=18, embed_level1=False,
        ),
    )
    P = amg._host_P[0].tocoo()
    dof = np.arange(2 * 6**3) % 2
    cdof = dof[amg._cf[0] > 0]
    assert (dof[P.row] == cdof[P.col]).all()
    b = jnp.asarray(A.to_scipy() @ np.ones(2 * 6**3))
    res = amg.solve(b, tol=1e-8, max_iter=60)
    assert bool(res.converged)


def test_nodal_coarsening_variants():
    """nodal > 0 (par_nodal_systems.c): all functions of a node share
    one CF decision; AN norm options 1/2/4 and the Sabs strength
    (inverted diagonal-dominance weak-row test) all converge."""
    import jax.numpy as jnp

    A = sys_laplacian_7pt(8, 8, 8, 2)  # 8^3x2: same nodal code paths,
    b = jnp.asarray(A.to_scipy() @ np.ones(1024))  # half the tier cost
    for nodal in (1, 2, 4, 6):
        amg = BoomerAMG(A, BoomerAMGOptions(
            coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
            num_functions=2, nodal=nodal, relax_down=13, relax_up=14,
            embed_level1=False))
        # node-aligned CF: both functions of a node agree
        cf = amg._cf[0]
        assert (cf[0::2] == cf[1::2]).all()
        res = amg.solve(b, tol=1e-8, max_iter=60)
        assert bool(res.converged), nodal


def test_nodal_oracle_pins():
    """Oracle-pinned nodal configs (hypre 2.20.0 serial, 2026-08-21:
    `ij -laplacian -n 10 10 10 -sysL 2 -nf 2 -solver 1 -pmis
    -interptype 0 -Pmx 4 -rlx 18 -nodal <k> -tol 1e-8`): PCG iteration
    counts match hypre EXACTLY for every norm option incl. the signed
    mode 3 (grid cx 1.422/1.436 vs hypre 1.423/1.436 — one deep-level
    truncation-tie node).  NOTE: the reference driver requires -nf 2
    alongside -sysL 2; without it hypre silently runs num_functions=1
    — the round-4 GAPS 'nodal delta' was an artifact of exactly that
    mis-flagged oracle run."""
    import jax.numpy as jnp

    from hypre_tpu.ops.dia import spmv as dspmv
    from hypre_tpu.solvers.krylov import PCGOptions, pcg

    A = sys_laplacian_7pt(10, 10, 10, 2)
    b = jnp.asarray(np.ones(A.num_rows))
    pins = ((1, 15), (3, 14), (4, 15), (6, 14))
    for nodal, want in pins:
        amg = BoomerAMG(A, BoomerAMGOptions(
            coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
            relax_down=18, relax_up=18, num_functions=2, nodal=nodal,
            max_row_sum=1.0, dtype="float64", embed_level1=False))
        E = amg.levels[0].A
        r = pcg(lambda x: dspmv(E, x), b, M=amg.precond,
                opts=PCGOptions(tol=1e-8, max_iter=100, two_norm=True))
        assert int(r.num_iterations) == want, (nodal, int(r.num_iterations))


def test_sysl_opt_variants():
    """-sysL_opt coupling-matrix variants (ij.c:7826): the SPD variant
    6 is oracle-pinned (13 PCG iterations, hypre 2.20.0 serial
    2026-08-21); the indefinite variant 3 generates (both sides stop
    at PCG breakdown) and identity variant 1 equals kron(L, I)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from hypre_tpu.ops.dia import spmv as dspmv
    from hypre_tpu.solvers.krylov import PCGOptions, pcg

    A = sys_laplacian_7pt(8, 8, 8, 2, sys_opt=6)
    b = jnp.asarray(np.ones(A.num_rows))
    amg = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18, num_functions=2, nodal=2,
        max_row_sum=1.0, dtype="float64", embed_level1=False))
    E = amg.levels[0].A
    r = pcg(lambda x: dspmv(E, x), b, M=amg.precond,
            opts=PCGOptions(tol=1e-8, max_iter=100, two_norm=True))
    assert int(r.num_iterations) == 13

    ident = sys_laplacian_7pt(4, 4, 4, 2, sys_opt=1).to_scipy()
    from hypre_tpu.models import laplacian_7pt
    L = laplacian_7pt(4, 4, 4).to_scipy()
    d = (ident - sp.kron(L, sp.eye(2))).tocoo()
    assert d.nnz == 0 or np.abs(d.data).max() == 0.0
