"""Shared-DOF identification between sstruct parts.

Reference: sstruct_ls/sstruct_sharedDOFComm.c — for node/edge/face
variables, DOFs on part boundaries coincide geometrically with DOFs of
neighboring parts and must be treated as ONE unknown; the reference
builds send/recv assumed-partition communication to agree on owners.

TPU design: parts live in one global index space (each part an
axis-aligned box at `origin`).  Every node/edge DOF gets a canonical
geometric KEY -- its DOUBLED global coordinate (nodes: 2*(origin+idx);
direction-d edges: doubled tail node + unit(d), so the odd component
encodes the direction).  np.unique over the concatenated keys yields
the global numbering and per-part local->global maps in one vectorized
pass; coincident boundary DOFs collapse automatically.  No
communication machinery is needed on a single address space -- the map
IS the exchange (gather/scatter by global id), which is also the form
a sharded implementation would consume (index maps feed jnp scatters).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _node_keys(shape, origin):
    nx, ny, nz = shape
    ox, oy, oz = origin
    gx, gy, gz = np.meshgrid(
        np.arange(nx + 1) + ox,
        np.arange(ny + 1) + oy,
        np.arange(nz + 1) + oz,
        indexing="ij",
    )
    # edge_structure numbers nodes in C-order of (nx+1, ny+1, nz+1)
    return np.stack(
        [2 * gx.ravel(), 2 * gy.ravel(), 2 * gz.ravel()], axis=1
    )


def _edge_keys(shape, origin):
    """Doubled midpoint keys in edge_structure's edge ordering
    (direction-major: all x-edges C-order, then y, then z)."""
    nx, ny, nz = shape
    NS = (nx + 1, ny + 1, nz + 1)
    keys = []
    for d in range(3):
        s = list(NS)
        s[d] -= 1
        gx, gy, gz = np.meshgrid(
            np.arange(s[0]) + origin[0],
            np.arange(s[1]) + origin[1],
            np.arange(s[2]) + origin[2],
            indexing="ij",
        )
        k = np.stack([2 * gx.ravel(), 2 * gy.ravel(), 2 * gz.ravel()], axis=1)
        k[:, d] += 1  # midpoint: tail + half a step along d
        keys.append(k)
    return np.concatenate(keys, axis=0)


def identify_dofs(keys_per_part):
    """Collapse geometrically coincident DOFs across parts.

    keys_per_part: list of int arrays [n_p, 3].  Returns (maps, n_glob):
    maps[p][l] = global id of part p's local DOF l; ids are assigned in
    lexicographic key order (deterministic, part-independent)."""
    sizes = [len(k) for k in keys_per_part]
    allk = np.concatenate(keys_per_part, axis=0)
    uniq, inv = np.unique(allk, axis=0, return_inverse=True)
    maps = []
    at = 0
    for s in sizes:
        maps.append(inv[at:at + s].astype(np.int64))
        at += s
    return maps, len(uniq)


def shared_node_edge_maps(shapes, origins):
    """Per-part local->global maps for NODE and EDGE variables of parts
    tiling a common index space.  Returns (node_maps, n_nodes, edge_maps,
    n_edges)."""
    nk = [_node_keys(s, o) for s, o in zip(shapes, origins)]
    ek = [_edge_keys(s, o) for s, o in zip(shapes, origins)]
    node_maps, nn = identify_dofs(nk)
    edge_maps, ne = identify_dofs(ek)
    return node_maps, nn, edge_maps, ne


def subassemble(mats, maps, n_glob):
    """A_glob = sum_p S_p^T A_p S_p with S_p the local->global selection.

    Each part's matrix must hold only its OWNED contribution for shared
    entries (see models/maxwell.py curlcurl_matrix_part ownership
    weighting) -- then the sum reproduces the single-domain operator
    exactly, the FEM-subassembly identity the reference's shared-DOF
    layer maintains across ranks."""
    out = None
    for A, m in zip(mats, maps):
        Ac = A.tocoo() if hasattr(A, "tocoo") else A.to_scipy().tocoo()
        G = sp.coo_matrix(
            (Ac.data, (m[Ac.row], m[Ac.col])), shape=(n_glob, n_glob)
        )
        out = G if out is None else out + G
    out = out.tocsr()
    out.sum_duplicates()
    out.sort_indices()
    return out


def scatter_to_global(vecs, maps, n_glob, combine="add"):
    out = np.zeros(n_glob, dtype=np.asarray(vecs[0]).dtype)
    for v, m in zip(vecs, maps):
        if combine == "add":
            np.add.at(out, m, np.asarray(v))
        else:  # "set": owners agree on shared values
            out[m] = np.asarray(v)
    return out
