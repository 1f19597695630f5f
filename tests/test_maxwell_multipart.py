"""Multi-part Maxwell with shared-DOF identification.

The contract (VERDICT r2 #7): a box split into parts, each contributing
its ownership-weighted curl-curl (models/maxwell.curlcurl_matrix_part),
subassembled through the geometric shared-DOF maps
(sstruct/shared_dof.py), must reproduce the single-part edge system
EXACTLY -- and the composed PNedelec TV solve must match the
single-part answer.  Reference: sstruct_ls/sstruct_sharedDOFComm.c +
maxwell_TV_setup.c parallel assembly.
"""
import numpy as np
import scipy.sparse as sp

from hypre_tpu.models.maxwell import curlcurl_matrix, curlcurl_matrix_part
from hypre_tpu.sstruct.shared_dof import (
    shared_node_edge_maps,
    subassemble,
)
from hypre_tpu.solvers.sstruct_ls.maxwell import (
    SStructMaxwell,
    SStructMaxwellOptions,
)


def _split_x(shape, nx1):
    nx, ny, nz = shape
    parts = [(nx1, ny, nz), (nx - nx1, ny, nz)]
    origins = [(0, 0, 0), (nx1, 0, 0)]
    return parts, origins


def test_subassembled_system_matches_global():
    shape = (6, 4, 4)
    parts, origins = _split_x(shape, 2)
    A_glob, _G, _xyz = curlcurl_matrix(*shape, alpha=1.0, beta=0.5)
    mats = [
        curlcurl_matrix_part(p, o, shape, alpha=1.0, beta=0.5)[0]
        for p, o in zip(parts, origins)
    ]
    _nm, _nn, emaps, ne = shared_node_edge_maps(parts, origins)
    A_sub = subassemble(mats, emaps, ne)
    assert ne == A_glob.shape[0]
    # identical up to the global renumbering: permute and compare
    # identify_dofs numbers by lexicographic key; build the same keys
    # for the single part to get the permutation
    _nm1, _nn1, emap1, ne1 = shared_node_edge_maps([shape], [(0, 0, 0)])
    perm = emap1[0]
    Ag = A_glob.to_scipy().tocoo()
    P = sp.coo_matrix(
        (np.ones(ne), (perm, np.arange(ne))), shape=(ne, ne)
    ).tocsr()
    A_ref = (P @ Ag @ P.T).tocsr()
    A_ref.sort_indices()
    diff = abs(A_sub - A_ref)
    assert diff.max() < 1e-12


def test_two_part_tv_solve_matches_single_part():
    shape = (8, 4, 4)
    parts, origins = _split_x(shape, 4)
    A_glob, _G, _xyz = curlcurl_matrix(*shape, alpha=1.0, beta=0.5)
    ne = A_glob.shape[0]
    rng = np.random.default_rng(7)
    b = rng.standard_normal(ne)

    single = SStructMaxwell([shape], [A_glob],
                            opts=SStructMaxwellOptions(tol=1e-8))
    assert single.tv is not None
    r1 = single.solve(b)

    mats = [
        curlcurl_matrix_part(p, o, shape, alpha=1.0, beta=0.5)[0]
        for p, o in zip(parts, origins)
    ]
    multi = SStructMaxwell(parts, mats, origins=origins,
                           opts=SStructMaxwellOptions(tol=1e-8))
    assert multi.tv is not None  # composed box is factor-2 coarsenable
    # the composed numbering IS edge_structure's canonical numbering
    # (canonicalize_edge_maps) — b carries over directly, and the
    # subassembled operator must equal the single-box system exactly
    assert abs(multi.A.to_scipy() - A_glob.to_scipy()).max() < 1e-12
    r2 = multi.solve(b)

    assert int(r1.num_iterations) == int(r2.num_iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               atol=1e-6)
    # per-part gather returns consistent shared values
    p0 = multi.part_values(r2.x, 0)
    p1 = multi.part_values(r2.x, 1)
    _nm, _nn, emaps, _ne2 = shared_node_edge_maps(parts, origins)
    shared = np.intersect1d(emaps[0], emaps[1])
    assert len(shared) > 0
    g0 = dict(zip(emaps[0].tolist(), p0.tolist()))
    g1 = dict(zip(emaps[1].tolist(), p1.tolist()))
    for g in shared[:50]:
        assert g0[g] == g1[g]


def test_rotated_single_part_reproduces_global():
    """A single part placed by a NONTRIVIAL signed permutation (local x
    -> global -y, local y -> global x) must subassemble to EXACTLY the
    canonical curl-curl of the global box: the signed edge maps +
    partition-of-unity weights are exact, not approximate (reference:
    maxwell_PNedelec.c transformed-part handling)."""
    shape = (4, 2, 2)           # local cells
    gshape = (2, 4, 2)          # global box after x<->y swap
    # local i=(ix,iy,iz) -> global (iy, 4-ix, iz)
    transforms = [((0, 4, 0), (1, 0, 2), (-1, 1, 1))]
    multi = SStructMaxwell([shape], transforms=transforms,
                           alpha=1.0, beta=0.5,
                           opts=SStructMaxwellOptions(tol=1e-8))
    from hypre_tpu.models.maxwell import curlcurl_matrix

    A_ref, _G, _xyz = curlcurl_matrix(*gshape, alpha=1.0, beta=0.5)
    d = abs(multi.A.to_scipy() - A_ref.to_scipy())
    assert d.max() < 1e-12


def test_rotated_two_part_tv_solve_matches_single_part():
    """VERDICT r3 #8: a box split into two parts with the SECOND part
    axis-flipped (local x runs backwards from the far face), solved via
    signed shared-DOF subassembly, must match the single-part TV solve
    exactly (same iterations, same solution)."""
    shape = (8, 4, 4)
    from hypre_tpu.models.maxwell import curlcurl_matrix

    A_glob, _G, _xyz = curlcurl_matrix(*shape, alpha=1.0, beta=0.5)
    ne = A_glob.shape[0]
    rng = np.random.default_rng(11)
    b = rng.standard_normal(ne)

    single = SStructMaxwell([shape], [A_glob],
                            opts=SStructMaxwellOptions(tol=1e-8))
    assert single.tv is not None
    r1 = single.solve(b)

    parts = [(4, 4, 4), (4, 4, 4)]
    transforms = [
        ((0, 0, 0), (0, 1, 2), (1, 1, 1)),    # identity placement
        ((8, 0, 0), (0, 1, 2), (-1, 1, 1)),   # x reversed from x=8
    ]
    multi = SStructMaxwell(parts, transforms=transforms,
                           alpha=1.0, beta=0.5,
                           opts=SStructMaxwellOptions(tol=1e-8))
    assert multi.tv is not None
    assert abs(multi.A.to_scipy() - A_glob.to_scipy()).max() < 1e-12
    r2 = multi.solve(b)
    assert int(r1.num_iterations) == int(r2.num_iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               atol=1e-6)
    # per-part gathers agree on shared interface edges (signed)
    p0 = multi.part_values(r2.x, 0)
    p1 = multi.part_values(r2.x, 1)
    assert np.isfinite(p0).all() and np.isfinite(p1).all()
