"""Level-2 lattice relocation (boomeramg._try_relocate_level2): the
relocation is a permutation similarity, so cycles must match the plain
hierarchy exactly (same iterates up to fp roundoff, same counts).

Reference analog: none (TPU-specific layout optimization); the
correctness contract is exact equivalence with the unrelocated
hierarchy and with the reference's convergence behavior.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.models import laplacian_7pt
from hypre_tpu.ops.dia import (
    DIAMatrix,
    ParityInterpOp,
    ParityRestrictOp,
    parity_merge,
    parity_split,
    relocate_to_cells,
    spmv,
)
from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
from hypre_tpu.solvers.krylov import PCGOptions, pcg

COMMON = dict(
    coarsen_type="pmis", interp_type="ext+i", P_max_elmts=4,
    relax_down=18, relax_up=18, nongalerkin_tol=0.02,
)


def test_parity_split_merge_roundtrip():
    shape, factors = (6, 4, 8), (2, 2, 2)
    x = jnp.arange(np.prod(shape), dtype=jnp.float64)
    parts = parity_split(x, shape, factors)
    assert len(parts) == 8 and parts[0].shape[0] == np.prod(shape) // 8
    y = parity_merge(parts, shape, factors)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_relocate_to_cells_is_injective_and_near():
    rng = np.random.default_rng(0)
    shape = (16, 16, 16)
    pos = np.sort(rng.choice(16**3, size=400, replace=False))
    cells = relocate_to_cells(pos, shape, (2, 2, 2))
    assert cells is not None
    assert len(np.unique(cells)) == len(pos)  # distinct cells
    # each assignment stays near its own position
    ix, iy, iz = pos % 16, (pos // 16) % 16, pos // 256
    cx, cy, cz = cells % 8, (cells // 8) % 8, cells // 64
    d = np.maximum.reduce([abs(ix // 2 - cx), abs(iy // 2 - cy), abs(iz // 2 - cz)])
    # the isotonic assignment keeps the bulk of points essentially at
    # their own cell (coherence is the contract, not the worst case:
    # rare row-overflow carries may travel further at this tiny scale)
    assert np.quantile(d, 0.9) <= 2
    assert d.max() <= 8


@pytest.mark.slow  # needs 24^3 to engage (~23 s); small_l2_gate + dia_tail parity stay fast
def test_relocated_hierarchy_matches_plain_exactly():
    # nx must stay 24: at 16^3 the level-1 operator falls under the
    # dense-freeze threshold and relocation never engages
    nx = 24
    n = nx**3
    A = laplacian_7pt(nx, nx, nx)
    b = jnp.asarray(A.to_scipy() @ np.ones(n))

    plain = BoomerAMG(A, BoomerAMGOptions(**COMMON, relocate_level2=False))
    reloc = BoomerAMG(
        A,
        BoomerAMGOptions(**COMMON, lattice_shape=(nx, nx, nx), relocate_min_n2=0),
    )
    assert isinstance(reloc.levels[1].P, ParityInterpOp)
    assert isinstance(reloc.levels[1].R, ParityRestrictOp)
    # large L2 -> lattice DIA; small L2 -> dense-MXU behind gather/scatter
    from hypre_tpu.ops.dia import ScatterOp

    assert isinstance(reloc.levels[2].A, (DIAMatrix, ScatterOp))

    sols = []
    for m in (plain, reloc):
        op = lambda x, E=m.levels[0].A: spmv(E, x)
        sols.append(pcg(op, b, M=m.precond, opts=PCGOptions(tol=1e-8, max_iter=100)))
    assert int(sols[0].num_iterations) == int(sols[1].num_iterations)
    np.testing.assert_allclose(np.asarray(sols[0].x), np.asarray(sols[1].x), atol=1e-10)


def test_small_l2_gate_keeps_plain_forms():
    nx = 24
    A = laplacian_7pt(nx, nx, nx)
    amg = BoomerAMG(A, BoomerAMGOptions(**COMMON, lattice_shape=(nx, nx, nx)))
    # n2 = ~670 <= default gate: relocation must NOT engage
    assert not isinstance(amg.levels[1].P, ParityInterpOp)
