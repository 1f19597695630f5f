"""Structured edge-element (Nedelec-0) Maxwell problem generators.

Reference analog: test/ams_driver.c builds curl-curl + mass systems with
a discrete gradient; sstruct_ls/maxwell_grad.c builds G from grid
topology.  Here: incidence matrices of a uniform hex lattice.

Unknowns: edges of an (nx+1)x(ny+1)x(nz+1) node lattice (x-, y-,
z-directed), nodes for the gradient space, faces for the curl.
A = alpha * C^T C + beta * M_e  (curl-curl plus lumped edge mass).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..ops.csr import CSRMatrix


def _node_id(shape):
    return np.arange(np.prod(shape)).reshape(shape)


def edge_structure(nx, ny, nz, h=1.0):
    """Returns (G, C, coords, n_edges): discrete gradient (edges x nodes,
    +1 head / -1 tail), discrete curl (faces x edges), node coords."""
    NS = (nx + 1, ny + 1, nz + 1)
    nid = _node_id(NS)
    nn = nid.size

    # edges per direction: head = node + unit(d)
    def edges_dir(d):
        sl_t = [slice(None)] * 3
        sl_h = [slice(None)] * 3
        sl_t[d] = slice(0, NS[d] - 1)
        sl_h[d] = slice(1, NS[d])
        tails = nid[tuple(sl_t)].ravel()
        heads = nid[tuple(sl_h)].ravel()
        return tails, heads

    tails, heads, edir = [], [], []
    for d in range(3):
        t, hd = edges_dir(d)
        tails.append(t)
        heads.append(hd)
        edir.append(np.full(len(t), d))
    tails = np.concatenate(tails)
    heads = np.concatenate(heads)
    edir = np.concatenate(edir)
    ne = len(tails)

    rows = np.repeat(np.arange(ne), 2)
    cols = np.stack([heads, tails], axis=1).ravel()
    vals = np.tile([1.0, -1.0], ne)
    G = sp.coo_matrix((vals, (rows, cols)), shape=(ne, nn)).tocsr()

    # edge lookup tables per direction for face assembly
    def edge_index_array(d):
        shape = list(NS)
        shape[d] -= 1
        base = {0: 0, 1: 0, 2: 0}
        offset = 0
        for dd in range(d):
            s = list(NS)
            s[dd] -= 1
            offset += int(np.prod(s))
        return offset + np.arange(int(np.prod(shape))).reshape(shape)

    E = [edge_index_array(d) for d in range(3)]

    # faces normal to direction d use edges in the two other directions
    faces_rows, faces_cols, faces_vals = [], [], []
    fcount = 0
    for d in range(3):
        d1, d2 = [x for x in range(3) if x != d]
        fshape = list(NS)
        fshape[d1] -= 1
        fshape[d2] -= 1
        nf = int(np.prod(fshape))
        fid = np.arange(nf).reshape(fshape) + fcount
        # face loop: +e1(at low d2) +e2(at high d1) -e1(at high d2) -e2(at low d1)
        idx = np.indices(fshape)

        def eidx(Ed, shift_dim=None):
            coords = [idx[k] for k in range(3)]
            if shift_dim is not None:
                dpos, amount = shift_dim
                coords[dpos] = coords[dpos] + amount
            return Ed[tuple(coords)]

        e1_lo = E[d1][tuple(idx)]
        e2_hi_coords = [idx[k].copy() for k in range(3)]
        e2_hi_coords[d1] += 1
        e2_hi = E[d2][tuple(e2_hi_coords)]
        e1_hi_coords = [idx[k].copy() for k in range(3)]
        e1_hi_coords[d2] += 1
        e1_hi = E[d1][tuple(e1_hi_coords)]
        e2_lo = E[d2][tuple(idx)]
        for earr, sgn in ((e1_lo, 1.0), (e2_hi, 1.0), (e1_hi, -1.0), (e2_lo, -1.0)):
            faces_rows.append(fid.ravel())
            faces_cols.append(earr.ravel())
            faces_vals.append(np.full(nf, sgn))
        fcount += nf

    C = sp.coo_matrix(
        (
            np.concatenate(faces_vals),
            (np.concatenate(faces_rows), np.concatenate(faces_cols)),
        ),
        shape=(fcount, ne),
    ).tocsr()

    gx, gy, gz = np.meshgrid(
        np.arange(NS[0]) * h, np.arange(NS[1]) * h, np.arange(NS[2]) * h,
        indexing="ij",
    )
    coords = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    return CSRMatrix.from_scipy(G), CSRMatrix.from_scipy(C), coords, ne


def curlcurl_matrix(nx, ny, nz, alpha=1.0, beta=1.0, h=1.0):
    """A = alpha C^T C + beta M_e (lumped edge mass = h * I scaled)."""
    G, C, coords, ne = edge_structure(nx, ny, nz, h)
    Cs = C.to_scipy()
    A = alpha * (Cs.T @ Cs) + beta * sp.eye(ne)
    A = A.tocsr()
    A.sort_indices()
    return CSRMatrix.from_scipy(A), G, coords
