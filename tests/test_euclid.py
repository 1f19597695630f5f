"""Euclid-shape parallel ILU (distributed_ls/Euclid role):
subdomain graph + coloring, block-diagonal ILU(k) wavefront solves,
colored block-GS smoothing, BoomerAMG smooth_type 9."""

import numpy as np
import pytest

import jax.numpy as jnp

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.solvers.amg.euclid import (
    build_euclid,
    color_subdomains,
    euclid_apply,
    euclid_smooth,
    subdomain_graph,
)


def test_subdomain_graph_and_coloring():
    A = laplacian_7pt(8, 8, 8).to_scipy().tocsr()
    n = A.shape[0]
    bounds = np.linspace(0, n, 5).astype(np.int64)
    adj = subdomain_graph(A, bounds)
    # contiguous row blocks of a 7-pt operator touch their neighbors
    assert 1 in adj[0] and 0 in adj[1]
    color = color_subdomains(adj)
    for d, nbrs in enumerate(adj):
        for nb in nbrs:
            assert color[d] != color[nb]


def test_euclid_apply_is_blockdiag_ilu():
    """B^{-1} on a block-diagonal matrix == exact per-domain solve for
    full fill within blocks (small blocks, ILU(k) with ample fill)."""
    rng = np.random.default_rng(0)
    import scipy.sparse as sp

    blocks = []
    for _ in range(3):
        M = rng.standard_normal((6, 6)) * 0.1 + 4 * np.eye(6)
        blocks.append(sp.csr_matrix(M))
    A = sp.block_diag(blocks, format="csr")
    ed = build_euclid(A, num_domains=3, fill_level=6, colored=False)
    r = rng.standard_normal(18)
    x = np.asarray(euclid_apply(ed, jnp.asarray(r)))
    x_ref = np.linalg.solve(A.toarray(), r)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)


@pytest.mark.slow  # ~6 s quality comparison; euclid correctness tests stay fast
def test_colored_beats_jacobi():
    A = laplacian_7pt(10, 10, 10).to_scipy().tocsr()
    n = A.shape[0]
    b = np.ones(n)
    errs = {}
    for colored in (False, True):
        ed = build_euclid(A, num_domains=4, fill_level=1, colored=colored)
        u = jnp.zeros(n)
        f = jnp.asarray(b)
        mv = lambda v: jnp.asarray(A @ np.asarray(v)) if False else None
        import jax

        Aj = jnp.asarray(A.toarray())
        matvec = lambda v: Aj @ v
        for _ in range(5):
            u = euclid_smooth(ed, matvec, u, f)
        errs[colored] = float(jnp.linalg.norm(f - matvec(u)))
    assert errs[True] < errs[False]


def test_boomeramg_smooth_type_9():
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(12, 12, 12)
    n = A.num_rows
    amg = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18,
        smooth_type=9, smooth_num_levels=2,
        euclid_domains=4, euclid_fill=1,
    ))
    assert amg.levels[0].euclid is not None
    assert amg.levels[1].euclid is not None
    assert amg.levels[2].euclid is None
    b = jnp.asarray(np.asarray(A.to_scipy() @ np.ones(n)))
    res = amg.solve(b, tol=1e-8, max_iter=30)
    assert bool(res.converged)
    # ILU smoothing beats l1-Jacobi on iteration count
    amg_j = BoomerAMG(A, BoomerAMGOptions(
        coarsen_type="pmis", interp_type="classical", P_max_elmts=4,
        relax_down=18, relax_up=18,
    ))
    res_j = amg_j.solve(b, tol=1e-8, max_iter=30)
    assert int(res.num_iterations) <= int(res_j.num_iterations)
