"""Box calculus + multi-box grids (struct_mv/box.c, box_manager.c,
communication_info.c roles) and the emptyproc regression family."""

import numpy as np
import pytest

from hypre_tpu.struct.box import (
    Box,
    BoxManager,
    bounding_box,
    distribute_PB,
    subtract_boxes,
    union_size,
)
from hypre_tpu.struct.multibox import (
    MultiBoxGrid,
    MultiBoxVector,
    multibox_matvec,
)


def _rand_box(rng, lo=-6, hi=8):
    a = rng.integers(lo, hi, size=3)
    b = rng.integers(lo, hi, size=3)
    return Box(tuple(np.minimum(a, b)), tuple(np.maximum(a, b)))


def test_box_algebra_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(300):
        a, b = _rand_box(rng), _rand_box(rng)
        inter = a.intersect(b)
        diff = subtract_boxes(a, b)
        # disjoint, inside a, miss b, and sizes add up
        assert sum(d.size for d in diff) + inter.size == a.size
        for d in diff:
            assert a.contains(d)
            assert d.intersect(b).empty
        for d1 in range(len(diff)):
            for d2 in range(d1 + 1, len(diff)):
                assert diff[d1].intersect(diff[d2]).empty


def test_union_size_overlaps():
    a = Box((0, 0, 0), (3, 3, 3))
    b = Box((2, 2, 2), (5, 5, 5))
    assert union_size([a, b]) == a.size + b.size - a.intersect(b).size


def test_box_manager_region_query():
    bm = BoxManager(3)
    boxes, _ = distribute_PB((4, 4, 4), (2, 2, 1), (1, 1, 1), 4)
    for rank, b in boxes:
        bm.add_entry(b, rank)
    bm.assemble()
    hits = bm.intersect(Box((3, 3, 0), (4, 4, 0)))
    assert len(hits) == 4  # the corner region touches all four boxes
    assert bm.intersect(Box((9, 9, 9), (9, 9, 9))) == []


def test_distribute_emptyproc():
    owners, gbox = distribute_PB((6, 6, 6), (2, 1, 2), (2, 2, 2), 7)
    # 4 ranks own 8 boxes each; ranks 4-6 own nothing
    assert len(owners) == 4 * 8
    assert gbox.shape == (24, 12, 24)
    assert union_size([b for _, b in owners]) == gbox.size


@pytest.mark.parametrize("P,B", [((2, 1, 2), (1, 1, 1)),
                                 ((2, 2, 1), (2, 1, 2))])
def test_multibox_matvec_matches_single(P, B):
    import jax.numpy as jnp

    from hypre_tpu.struct import StructGrid, StructMatrix, struct_matvec

    owners, gbox = distribute_PB((4, 4, 4), P, B, int(np.prod(P)))
    grid = MultiBoxGrid([b for _, b in owners])
    assert grid.is_rectangular()
    shape = gbox.shape
    rng = np.random.default_rng(1)
    offs = [(0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
            (0, 0, -1), (0, 0, 1)]
    glob = {o: rng.standard_normal(shape) for o in offs}
    ent_mb = {
        o: {
            i: glob[o][grid.boxes[i].slice_in(gbox)]
            for i in grid.nonempty
        }
        for o in offs
    }
    xt = rng.standard_normal(shape)
    xs = MultiBoxVector.from_global(grid, xt)
    y = np.asarray(multibox_matvec(grid, ent_mb, xs).to_global())
    A = StructMatrix.from_dict(
        {o: jnp.asarray(v) for o, v in glob.items()}, StructGrid(shape)
    )
    y_ref = np.asarray(struct_matvec(A, jnp.asarray(xt)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_emptyproc_regression_smg():
    """[REF] TEST_struct/emptyproc.saved: struct -n 12 12 12 -P 2 1 2
    -solver 0 -> 6 iterations (np 4 and 6 — empty ranks — agree)."""
    from hypre_tpu.drivers import struct as struct_driver

    for extra in ("-np 4", "-np 6"):
        res = struct_driver.run(
            f"-n 12 12 12 -P 2 1 2 -solver 0 {extra}".split()
        )
        assert int(res.num_iterations) == 6
        assert float(res.rel_residual_norm) < 1e-6
    # blocked variant: -n 6 6 6 -b 2 2 2 -P 2 1 2 np=7 — same problem
    res = struct_driver.run(
        "-n 6 6 6 -b 2 2 2 -P 2 1 2 -solver 0 -np 7".split()
    )
    assert int(res.num_iterations) == 6


@pytest.mark.slow
def test_emptyproc_regression_pfmg():
    """[REF] emptyproc.saved: -P 2 2 1 -solver 1 -> 16 iterations."""
    from hypre_tpu.drivers import struct as struct_driver

    res = struct_driver.run("-n 12 12 12 -P 2 2 1 -solver 1 -np 6".split())
    assert int(res.num_iterations) == 16
    res = struct_driver.run(
        "-n 6 6 6 -b 2 2 2 -P 2 2 1 -solver 1 -np 7".split()
    )
    assert int(res.num_iterations) == 16
