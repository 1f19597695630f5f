"""Device-side Galerkin RAP for lattice-embedded DIA operators.

The level-1 embedded operator A1 = P^T A0 P (solvers/amg/boomeramg.py
embedding) is ~97% structural zeros as a dense-diagonal array, yet
round 1 built it on the single-core host and shipped ~340MB through a
~170MB/s remote-device tunnel — the largest single setup cost.  Here the
TPU computes it instead, from arrays the solve phase needs anyway:

  A1[x, x+o] = sum_{kp1,ka,kp2} P[kp1, u] * A0[ka, u] * P[kp2, u+oa]
               evaluated at u = x - op1,  o = -op1 + oa + op2

Every term is a shifted elementwise triple product of diagonal rows —
pure dynamic-slices and multiplies, no gathers/scatters (the same
offset-algebra that makes the Pallas DIA SpMV fast).  The host supplies
only the SYMBOLIC structure: which (kp1, ka, kp2) terms feed which
output offset, which output offsets survive the non-Galerkin filter
(pattern decisions stay on host = bitwise-stable hierarchy structure),
and the filter threshold.  Dropped mass is lumped onto the diagonal on
device, mirroring solvers/amg/rap.py:nongalerkin_filter.

Reference analog: par_rap.c hypre_BoomerAMGBuildCoarseOperator +
par_nongalerkin.c, re-expressed for a machine where the coarse operator
lives as lattice diagonals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from ..utils.errors import arg_error


def plan_embedded_rap(offs_P, offs_A, offs_out_unf, offs_out_filt):
    """Host-side symbolic planning.

    offs_P/offs_A: DIA offsets of the embedded P and fine A.
    offs_out_unf: offsets of the UNFILTERED embedded RAP (from the host
      scipy product — exact, so no symbolic-superset memory blowup).
    offs_out_filt: offsets surviving the non-Galerkin filter (the stored
      pattern).  Returns the padded term tables + slot maps.
    """
    offs_P = np.asarray(offs_P, dtype=np.int64)
    offs_A = np.asarray(offs_A, dtype=np.int64)
    unf = np.asarray(sorted(offs_out_unf), dtype=np.int64)
    filt = set(int(o) for o in offs_out_filt)
    pos = {int(o): j for j, o in enumerate(unf)}

    terms = [[] for _ in unf]
    for kp1, op1 in enumerate(offs_P):
        for ka, oa in enumerate(offs_A):
            for kp2, op2 in enumerate(offs_P):
                o = int(-op1 + oa + op2)
                j = pos.get(o)
                if j is not None:
                    terms[j].append((kp1, ka, kp2))
    tmax = max((len(t) for t in terms), default=1) or 1
    nu = len(unf)
    T = np.zeros((nu, tmax, 3), dtype=np.int32)
    valid = np.zeros((nu, tmax), dtype=bool)
    for j, ts in enumerate(terms):
        for t, tri in enumerate(ts):
            T[j, t] = tri
            valid[j, t] = True
    slot = np.full(nu, -1, dtype=np.int32)
    filt_sorted = sorted(filt)
    fpos = {o: i for i, o in enumerate(filt_sorted)}
    for j, o in enumerate(unf):
        if int(o) in fpos:
            slot[j] = fpos[int(o)]
    diag_j = pos.get(0)
    if diag_j is None:
        raise arg_error("RAP without a diagonal offset")
    return dict(
        unf=unf, T=T, valid=valid, slot=slot, diag_j=int(diag_j),
        filt=np.asarray(filt_sorted, dtype=np.int64), tmax=tmax,
    )


@partial(
    jax.jit,
    static_argnames=("n", "width_out", "pad", "tmax", "diag_j", "nout",
                     "out_dtype"),
)
def _embedded_rap_run(
    P_data, A_data, offs_P, offs_A, unf, T, valid, slot,
    tol, *, n, width_out, pad, tmax, diag_j, nout, out_dtype,
):
    """One device pass: unfiltered rows -> filter -> lump -> packed out.

    P_data: [noffP, >=n]; A_data: [noffA, >=n] (width-padded DIA rows).
    Returns (out [nout+1 trash, width_out], diag_unf [n], lump [n]).
    Memory stays O(nout * width_out + inputs): rows are produced,
    filtered, and stored one at a time (a full unfiltered buffer would
    not fit HBM at 256^3).
    """
    # accumulate in f64 only when the inputs are f64 (the oracle-parity
    # host-precision path); bf16/f32 production inputs accumulate in f32
    f32 = jnp.float64 if P_data.dtype == jnp.float64 else jnp.float32

    # zero-padded working rows so every shifted read is in-bounds:
    # buf[pad + u] = row[u]
    def padrow(d):
        z = jnp.zeros((d.shape[0], 2 * pad + n), f32)
        return jax.lax.dynamic_update_slice(
            z, d[:, :n].astype(f32), (0, pad)
        )

    Pp = padrow(P_data)
    Ap = padrow(A_data)

    def row_for(j):
        """Unfiltered RAP row for output offset index j (length n)."""
        def term(t, row):
            kp1 = T[j, t, 0]
            ka = T[j, t, 1]
            kp2 = T[j, t, 2]
            op1 = offs_P[kp1]
            oa = offs_A[ka]
            i32 = jnp.int32
            p1 = jax.lax.dynamic_slice(Pp, (kp1, i32(pad)), (1, n))[0]
            a = jax.lax.dynamic_slice(Ap, (ka, i32(pad)), (1, n))[0]
            p2 = jax.lax.dynamic_slice(Pp, (kp2, i32(pad) + oa), (1, n))[0]
            g = p1 * a * p2  # g[u], u-indexed
            # contribution[x] = g[x - op1]: pad g then slice at pad - op1
            gz = jnp.zeros(2 * pad + n, f32)
            gz = jax.lax.dynamic_update_slice(gz, g, (pad,))
            contrib = jax.lax.dynamic_slice(gz, (jnp.int32(pad) - op1,), (n,))
            return row + jnp.where(valid[j, t], contrib, 0.0)

        return jax.lax.fori_loop(0, tmax, term, jnp.zeros(n, f32))

    # pass 1: the unfiltered diagonal (defines the filter threshold)
    diag = row_for(diag_j)
    dabs = jnp.sqrt(jnp.abs(diag))
    dz = jnp.zeros(2 * pad + n, f32)
    dz = jax.lax.dynamic_update_slice(dz, dabs, (pad,))

    def body(j, state):
        out, lump = state
        row = row_for(j)
        o = unf[j]
        # threshold row: tol * sqrt(|d_i|) * sqrt(|d_{i+o}|)
        d_shift = jax.lax.dynamic_slice(dz, (jnp.int32(pad) + o,), (n,))
        thr = tol * dabs * d_shift
        sl = slot[j]
        is_diag = j == diag_j
        # offsets the host filter dropped entirely (sl < 0) stay dropped
        # even if f32 re-evaluation lands epsilon above threshold — the
        # PATTERN is a host decision, only values come from the device
        keep = ((jnp.abs(row) >= thr) & (sl >= 0)) | is_diag
        lump = lump + jnp.where(keep, 0.0, row)
        out_row = jnp.zeros(width_out, f32).at[:n].set(
            jnp.where(keep, row, 0.0)
        )
        wslot = jnp.where(sl >= 0, sl, nout).astype(jnp.int32)  # trash row
        out = jax.lax.dynamic_update_slice(
            out, out_row[None].astype(out.dtype), (wslot, jnp.int32(0))
        )
        return out, lump

    out0 = jnp.zeros((nout + 1, width_out), jnp.dtype(out_dtype))
    out, lump = jax.lax.fori_loop(
        0, slot.shape[0], body, (out0, jnp.zeros(n, f32))
    )
    return out, diag, lump


@partial(jax.jit, static_argnames=("offs_p", "n", "width"))
def _dia_transpose_run(P_data, *, offs_p, n, width):
    """Row-aligned DIA transpose: R_data[kr, x] = P_data[kp, x + or]
    with or = -op (sorted ascending).  Pure static shifts — bitwise the
    values of the host-built transpose, no arithmetic."""
    span = max(abs(int(o)) for o in offs_p) if offs_p else 0
    Pp = jnp.pad(P_data[:, :n], ((0, 0), (span, span)))
    # R offsets sorted ascending = negated P offsets reversed
    rows = []
    for kr, op in enumerate(reversed(offs_p)):
        orr = -int(op)
        kp = len(offs_p) - 1 - kr
        row = jax.lax.slice(Pp, (kp, span + orr), (kp + 1, span + orr + n))[0]
        rows.append(jnp.pad(row, (0, width - n)))
    return jnp.stack(rows)


def dia_transpose_device(P_emb, width: int):
    """Transpose a square embedded DIAMatrix on device."""
    from .dia import DIAMatrix

    n = P_emb.num_rows
    data = _dia_transpose_run(
        P_emb.data, offs_p=tuple(int(o) for o in P_emb.offsets),
        n=n, width=width,
    )
    return DIAMatrix(
        data=data,
        offsets=tuple(-int(o) for o in reversed(P_emb.offsets)),
        num_rows=n,
        num_cols=n,
    )


def embedded_rap_device(
    P_emb, A0, plan, tol, width_out, out_dtype
):
    """Compute the filtered embedded RAP on device.

    P_emb/A0: DIAMatrix with device (or numpy) data.
    Returns (data [nfilt, width_out] out_dtype, diag_unf, lump) — the
    final diagonal row is data[diag] + lump, applied here.
    """
    n = A0.num_rows
    offs_P = np.asarray(P_emb.offsets, dtype=np.int64)
    offs_A = np.asarray(A0.offsets, dtype=np.int64)
    span = int(
        max(
            np.abs(offs_P).max(initial=0) * 2 + np.abs(offs_A).max(initial=0),
            np.abs(plan["unf"]).max(initial=0),
        )
    )
    pad = span + 8
    out, diag, lump = _embedded_rap_run(
        P_emb.data, A0.data,
        jnp.asarray(offs_P, jnp.int32), jnp.asarray(offs_A, jnp.int32),
        jnp.asarray(plan["unf"], jnp.int32),
        jnp.asarray(plan["T"]), jnp.asarray(plan["valid"]),
        jnp.asarray(plan["slot"]),
        jnp.asarray(tol, jnp.float32),
        n=n, width_out=width_out, pad=pad, tmax=plan["tmax"],
        diag_j=plan["diag_j"], nout=len(plan["filt"]),
        out_dtype=np.dtype(out_dtype).name,
    )
    # fold the lumped mass into the stored diagonal row
    filt = plan["filt"]
    dslot = int(np.searchsorted(filt, 0))
    data = out[:-1]  # drop trash row
    drow = (data[dslot][:n].astype(jnp.float32) + lump).astype(data.dtype)
    data = data.at[dslot, :n].set(drow)
    return data, diag, lump
