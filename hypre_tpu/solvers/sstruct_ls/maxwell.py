"""SStruct Maxwell solver.

Reference: sstruct_ls/maxwell_{TV_setup,solve,grad,PNedelec}.c (~10
kLoC): an edge-element Maxwell solver on semi-structured grids that
derives the discrete gradient G from the grid TOPOLOGY
(maxwell_grad.c:36: one row per edge, +-1 at the edge's endpoint nodes)
and runs a nodal-auxiliary multigrid on the edge system.

Here: per part, G and the vertex coordinates come from the part's
lattice (models/maxwell.py edge_structure); inter-part edge identities
flow through the assembled CSR (same-orientation parts).  The solve is
the auxiliary-space decomposition of AMS (ams.c) driven on the
assembled edge system — the reference's Maxwell solver predates and
parallels AMS, sharing the gradient/nodal-space construction.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...models.maxwell import edge_structure
from ...ops.csr import CSRMatrix
from ..amg.ams import AMS, AMSOptions
from ..krylov.common import SolverResult


@dataclasses.dataclass
class SStructMaxwellOptions:
    tol: float = 1e-6
    max_iter: int = 200
    ams: AMSOptions = dataclasses.field(default_factory=AMSOptions)


class SStructMaxwell:
    """Edge-element Maxwell on a multi-part lattice grid.

    parts: list of (nx, ny, nz) lattice shapes; A_parts: list of edge
    curl-curl systems per part (CSRMatrix); inter-part coupling via an
    optional U CSR over the concatenated edge numbering.
    """

    def __init__(
        self,
        parts,
        A_parts,
        U=None,
        opts: SStructMaxwellOptions = SStructMaxwellOptions(),
    ):
        import scipy.sparse as sp

        self.opts = opts
        Gs, coords, sizes = [], [], []
        for shape in parts:
            G, _C, xyz, ne = edge_structure(*shape)
            Gs.append(G.to_scipy() if hasattr(G, "to_scipy") else G)
            coords.append(xyz)
            sizes.append(ne)
        Gall = sp.block_diag(Gs, format="csr")
        xyz_all = np.vstack(coords)
        Aall = sp.block_diag(
            [a.to_scipy() if hasattr(a, "to_scipy") else a for a in A_parts],
            format="csr",
        )
        if U is not None:
            Aall = (Aall + (U.to_scipy() if hasattr(U, "to_scipy") else U)).tocsr()
        self.A = CSRMatrix.from_scipy(Aall.tocsr())
        self.ams = AMS(self.A, CSRMatrix.from_scipy(Gall), xyz_all, opts.ams)
        self.edge_offsets = np.cumsum([0] + sizes)

    def solve(self, b, x0=None) -> SolverResult:
        return self.ams.solve(b, tol=self.opts.tol, max_iter=self.opts.max_iter)

    def precond(self, r):
        return self.ams.precond(r)
