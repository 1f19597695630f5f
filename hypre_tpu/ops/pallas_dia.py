"""Experimental Pallas DIA SpMV kernel (windowed HBM DMA).

Correct (validated vs the XLA shift path) but not yet faster on current
hardware: 1-D VMEM layouts force lane-unaligned dynamic slices.  The
planned faster variant reshapes x windows to [sublane, 128] tiles and
splits each diagonal offset into (lane-aligned slice, pltpu.roll) pairs.
Kept for the next optimization round; `ops.dia.dia_spmv` (XLA fused
shifts) is the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dia import DIAMatrix


def pallas_dia_spmv(A: DIAMatrix, x: jax.Array, blk: int = 2048) -> jax.Array:
    """y = A @ x; requires float32 inputs and 32-bit mode."""
    n = A.num_rows
    offs = A.offsets
    span = max(offs) - min(offs)
    pad_lo = -min(offs)
    n_blk = -(-n // blk)
    n_pad = n_blk * blk

    xp = jnp.zeros(n_pad + span + blk, x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (pad_lo,))
    data = A.data
    if data.shape[1] != n_pad:
        data = jnp.pad(data, ((0, 0), (0, n_pad - data.shape[1])))

    lo = min(offs)

    def kernel(xref, dref, yref, xwin, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(xref.at[pl.ds(i * blk, blk + span)], xwin, sem)
        cp.start()
        cp.wait()
        acc = None
        for k, off in enumerate(offs):
            t = dref[k, :] * xwin[pl.ds(off - lo, blk)]
            acc = t if acc is None else acc + t
        yref[...] = acc

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((len(offs), blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((blk + span,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, data)
    return y[:n]
