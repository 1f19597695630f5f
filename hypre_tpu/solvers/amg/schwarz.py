"""Overlapping Schwarz block smoother/preconditioner.

Reference: parcsr_ls/schwarz.c (3.7 kLoC — overlapping Schwarz with
variants 0-3: multiplicative/additive x single-domain/multiplicative
among ranks; domains from rows or aggregates).

TPU design: uniform contiguous row blocks with symmetric overlap (the
domain-per-row-block scheme); block inverses precomputed dense at setup
and applied as one batched [nblocks, bs, bs] @ [nblocks, bs] MXU matmul
— additive Schwarz with overlap-averaged scatter.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.csr import CSRMatrix


@dataclasses.dataclass(frozen=True)
class SchwarzOptions:
    block_size: int = 64
    overlap: int = 8  # rows of overlap on each side (variant 0 analog)


class Schwarz:
    def __init__(self, A: CSRMatrix, opts: SchwarzOptions = SchwarzOptions()):
        self.opts = opts
        As = A.to_scipy().tocsr()
        n = A.num_rows
        bs, ov = opts.block_size, opts.overlap
        width = bs + 2 * ov
        starts = list(range(0, n, bs))
        nb = len(starts)

        inv = np.zeros((nb, width, width))
        idx = np.full((nb, width), n, dtype=np.int32)  # pad -> sink
        own = np.zeros((nb, width), dtype=bool)  # restricted (RAS) scatter
        for k, s in enumerate(starts):
            lo = max(0, s - ov)
            hi = min(n, s + bs + ov)
            rows = np.arange(lo, hi)
            blk = As[rows][:, rows].toarray()
            inv[k, : len(rows), : len(rows)] = np.linalg.pinv(blk, rcond=1e-12)
            idx[k, : len(rows)] = rows
            own[k, : len(rows)] = (rows >= s) & (rows < min(n, s + bs))

        self.n = n
        self._inv = jnp.asarray(inv)
        self._idx = jnp.asarray(idx)
        self._own = jnp.asarray(own)

    def solve(self, r):
        """Restricted additive Schwarz: solve on overlapped blocks,
        scatter only the owned rows (the standard RAS variant)."""
        r_ext = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
        rb = r_ext[self._idx]  # [nb, width]
        zb = jnp.einsum("kij,kj->ki", self._inv, rb)
        zb = jnp.where(self._own, zb, 0.0)
        z = jnp.zeros(self.n + 1, r.dtype).at[self._idx.ravel()].add(zb.ravel())
        return z[: self.n]

    @property
    def precond(self):
        return self.solve
