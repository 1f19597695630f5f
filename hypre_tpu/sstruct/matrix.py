"""Semi-structured matrices: S-part (stencils) + U-part (unstructured).

Reference: sstruct_mv/sstruct_matrix.{c,h} (sstruct_matrix.h:21-76 —
structured couplings per part/var-pair stored as StructMatrices, all
other entries in one ParCSR U-matrix) and sstruct_matvec.c (dispatch
over S and U parts).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.csr import CSRMatrix
from ..ops.dia import freeze_auto, spmv
from ..struct.matrix import StructMatrix, struct_matvec
from .grid import SStructGrid
from .vector import pack_vector, unpack_vector


class SStructMatrix:
    """smats[(part, vi, vj)] -> StructMatrix (intra-part stencils);
    umat: global CSR over the concatenated unknown ordering (inter-part
    couplings + arbitrary graph entries), frozen with freeze_auto."""

    def __init__(
        self,
        grid: SStructGrid,
        smats: dict,
        umat: Optional[CSRMatrix] = None,
        dtype=None,
    ):
        self.grid = grid
        self.smats = dict(smats)
        self.u_host = umat
        self.umat = None
        if umat is not None and umat.nnz > 0:
            self.umat = freeze_auto(umat, dtype=dtype)

    def diag_block(self, part: int, var: int = 0) -> StructMatrix:
        return self.smats[(part, var, var)]

    def to_scipy(self):
        """Assemble the full monolithic matrix (testing / oracle checks)."""
        import scipy.sparse as sp

        n = self.grid.total_size
        offs = self.grid.offsets()
        M = sp.coo_matrix((n, n))
        blocks = []
        for (p, vi, vj), sm in self.smats.items():
            B = sm.to_scipy().tocoo()
            blocks.append(
                sp.coo_matrix(
                    (B.data, (B.row + offs[(p, vi)], B.col + offs[(p, vj)])),
                    shape=(n, n),
                )
            )
        M = sum(blocks) if blocks else M
        if self.u_host is not None:
            M = M + self.u_host.to_scipy()
        return M.tocsr()


def sstruct_matvec(A: SStructMatrix, x, alpha=1.0, beta=0.0, y=None):
    """y = alpha*(S + U) x + beta*y (sstruct_matvec.c dispatch)."""
    grid = A.grid
    out = []
    for p in range(grid.nparts):
        row = []
        for vi in range(grid.nvars(p)):
            acc = None
            for vj in range(grid.nvars(p)):
                sm = A.smats.get((p, vi, vj))
                if sm is None:
                    continue
                t = struct_matvec(sm, x[p][vj])
                acc = t if acc is None else acc + t
            if acc is None:
                acc = jnp.zeros_like(x[p][vi])
            row.append(acc)
        out.append(row)
    if A.umat is not None:
        flat = spmv(A.umat, pack_vector(x))
        u_parts = unpack_vector(flat, grid)
        for p in range(grid.nparts):
            for v in range(grid.nvars(p)):
                out[p][v] = out[p][v] + u_parts[p][v]
    res = tuple(tuple(r) for r in out)
    if alpha != 1.0:
        res = jax.tree.map(lambda a: alpha * a, res)
    if y is not None and beta != 0.0:
        res = jax.tree.map(lambda a, b_: a + beta * b_, res, y)
    return res
