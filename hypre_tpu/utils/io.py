"""Matrix/vector I/O in the reference's on-disk formats + hierarchy
checkpointing.

Reference: IJ_mv HYPRE_IJMatrixPrint/Read (per-rank files `prefix.00000`
with an "ilower iupper jlower jupper" header then "row col value" lines;
vectors: "ilower iupper" then "index value"), used by ex5.c:225-285 and
the test drivers' -print/-fromfile flags.  SURVEY §5: setup is
deterministic so "resume" = re-setup; we additionally checkpoint frozen
AMG hierarchies (npz of per-level CSRs + CF markers) so a solve can
restart without redoing setup — the orbax-style analog.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import scipy.sparse as sp

from ..ops.csr import CSRMatrix


def write_ij_matrix(A: CSRMatrix, prefix: str, rank: int = 0) -> str:
    """HYPRE_IJMatrixPrint format (one shard, 0-based global indices)."""
    path = f"{prefix}.{rank:05d}"
    n, m = A.shape
    with open(path, "w") as f:
        f.write(f"0 {n - 1} 0 {m - 1}\n")
        rows = np.repeat(np.arange(n), A.row_nnz())
        for r, c, v in zip(rows, A.indices, A.data):
            f.write(f"{r} {c} {v:.14e}\n")
    return path


def read_ij_matrix(prefix: str) -> CSRMatrix:
    """Reads all `prefix.NNNNN` rank files (or a single exact path)."""
    files = sorted(glob.glob(f"{prefix}.[0-9]*")) or [prefix]
    rows_l, cols_l, vals_l = [], [], []
    iupper = jupper = 0
    for path in files:
        with open(path) as f:
            hdr = f.readline().split()
            iupper = max(iupper, int(hdr[1]))
            jupper = max(jupper, int(hdr[3]))
            data = np.loadtxt(f, ndmin=2)
        if data.size:
            rows_l.append(data[:, 0].astype(np.int64))
            cols_l.append(data[:, 1].astype(np.int64))
            vals_l.append(data[:, 2])
    return CSRMatrix.from_coo(
        np.concatenate(rows_l),
        np.concatenate(cols_l),
        np.concatenate(vals_l),
        (iupper + 1, jupper + 1),
    )


def write_ij_vector(v: np.ndarray, prefix: str, rank: int = 0) -> str:
    path = f"{prefix}.{rank:05d}"
    v = np.asarray(v)
    with open(path, "w") as f:
        f.write(f"0 {len(v) - 1}\n")
        for i, x in enumerate(v):
            f.write(f"{i} {x:.14e}\n")
    return path


def read_ij_vector(prefix: str) -> np.ndarray:
    files = sorted(glob.glob(f"{prefix}.[0-9]*")) or [prefix]
    n = 0
    chunks = []
    for path in files:
        with open(path) as f:
            hdr = f.readline().split()
            n = max(n, int(hdr[1]) + 1)
            data = np.loadtxt(f, ndmin=2)
        chunks.append(data)
    out = np.zeros(n)
    for data in chunks:
        out[data[:, 0].astype(np.int64)] = data[:, 1]
    return out


# ---------------------------------------------------------------------------
# hierarchy checkpointing
# ---------------------------------------------------------------------------

def save_amg_hierarchy(amg, path: str) -> None:
    """Persist the host-side hierarchy (CSRs, P's, CF markers, options)."""
    arrays = {}
    meta = {"num_levels": len(amg._host_A)}
    for l, M in enumerate(amg._host_A):
        Mc = M.tocsr()
        arrays[f"A{l}_indptr"] = Mc.indptr
        arrays[f"A{l}_indices"] = Mc.indices
        arrays[f"A{l}_data"] = Mc.data
        arrays[f"A{l}_shape"] = np.array(Mc.shape)
    for l, P in enumerate(amg._host_P):
        if P is None and hasattr(amg, "host_P"):
            P = amg.host_P(l)
        Pc = P.tocsr()
        arrays[f"P{l}_indptr"] = Pc.indptr
        arrays[f"P{l}_indices"] = Pc.indices
        arrays[f"P{l}_data"] = Pc.data
        arrays[f"P{l}_shape"] = np.array(Pc.shape)
    for l, cf in enumerate(amg._cf):
        arrays[f"cf{l}"] = cf
    import dataclasses as dc
    import json

    arrays["opts_json"] = np.frombuffer(
        json.dumps(dc.asdict(amg.opts)).encode(), dtype=np.uint8
    )
    arrays["num_levels"] = np.array(meta["num_levels"])
    np.savez_compressed(path, **arrays)


def load_amg_hierarchy(path: str):
    """Rebuild a BoomerAMG from a checkpoint (device arrays re-frozen)."""
    import json

    from ..solvers.amg.boomeramg import BoomerAMG, BoomerAMGOptions

    z = np.load(path)
    opts = BoomerAMGOptions(**json.loads(bytes(z["opts_json"]).decode()))
    L = int(z["num_levels"])

    amg = BoomerAMG.__new__(BoomerAMG)
    amg.opts = opts
    amg._host_A = []
    amg._host_P = []
    amg._cf = []
    amg.levels = []
    amg._fast = None
    amg._host_A1_unf = None
    amg._pending_rap = None
    for l in range(L):
        amg._host_A.append(
            sp.csr_matrix(
                (z[f"A{l}_data"], z[f"A{l}_indices"], z[f"A{l}_indptr"]),
                shape=tuple(z[f"A{l}_shape"]),
            )
        )
        amg._cf.append(z[f"cf{l}"])
    for l in range(L - 1):
        amg._host_P.append(
            sp.csr_matrix(
                (z[f"P{l}_data"], z[f"P{l}_indices"], z[f"P{l}_indptr"]),
                shape=tuple(z[f"P{l}_shape"]),
            )
        )
    amg._host_R = [None] * (L - 1)
    amg._host_A1_unf = None  # unfiltered pattern not checkpointed:
    amg._pending_rap = None  # the host embedding path rebuilds A1
    amg._freeze_hierarchy()
    return amg
