"""Probe which dynamic-gather forms Mosaic lowers on this TPU, and how
fast.  Decides the coarse-level SpMV format (hybrid-DIA tail vs
Pallas ELL-gather with x resident in VMEM)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

rng = np.random.default_rng(0)


def run(name, kernel, out_shape, *args, expect=None):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        r = np.asarray(jax.jit(f)(*args))
        ok = "" if expect is None else (
            " CORRECT" if np.allclose(r, expect) else " WRONG-VALUES")
        print(f"{name}: OK{ok}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


# 1. take_along_axis along lanes: out[s,l] = x[s, idx[s,l]]
x2 = rng.standard_normal((64, 512)).astype(np.float32)
iL = rng.integers(0, 512, size=(64, 512)).astype(np.int32)
run("taa-lane  (64,512)",
    lambda x_ref, i_ref, o_ref: o_ref.__setitem__(
        ..., jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)),
    jax.ShapeDtypeStruct((64, 512), jnp.float32), x2, iL,
    expect=np.take_along_axis(x2, iL, axis=1))

# 2. take_along_axis along sublanes
iS = rng.integers(0, 64, size=(64, 512)).astype(np.int32)
run("taa-sub   (64,512)",
    lambda x_ref, i_ref, o_ref: o_ref.__setitem__(
        ..., jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)),
    jax.ShapeDtypeStruct((64, 512), jnp.float32), x2, iS,
    expect=np.take_along_axis(x2, iS, axis=0))

# 3. flat take: arbitrary flat gather from a VMEM-resident 1-D table
xf = rng.standard_normal(128 * 1024).astype(np.float32)
iF = rng.integers(0, xf.size, size=(64, 512)).astype(np.int32)
run("flat-take (128k tbl)",
    lambda x_ref, i_ref, o_ref: o_ref.__setitem__(
        ..., jnp.take(x_ref[...], i_ref[...], axis=0).reshape(64, 512)
        if x_ref[...].ndim == 1 else x_ref[...]),
    jax.ShapeDtypeStruct((64, 512), jnp.float32), xf, iF,
    expect=xf[iF])

# 4. two-step: sublane select then lane select on a (64,512) table --
#    out[s,l] = x[r[s,l], c[s,l]] via one-hot matmul rows + taa lanes?
#    (skipped -- only if 1-3 fail)

# 5. timing of taa-lane at scale if supported: (256, 512) blocks,
#    grid over 16 blocks, chained
def k_big(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

try:
    S, L, G = 512, 512, 8
    xb = rng.standard_normal((S, L)).astype(np.float32)
    ib = rng.integers(0, L, size=(G * S, L)).astype(np.int32)
    f = pl.pallas_call(
        k_big,
        grid=(G,),
        in_specs=[pl.BlockSpec((S, L), lambda g: (0, 0)),
                  pl.BlockSpec((S, L), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((S, L), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((G * S, L), jnp.float32),
    )
    r = np.asarray(jax.jit(f)(xb, ib))
    ok = np.allclose(r[:S], np.take_along_axis(xb, ib[:S], axis=1))
    def chain(k, x, i):
        def body(j, acc):
            return acc + f(x, i)[0, :1]
        return jax.lax.fori_loop(0, k, body, jnp.zeros(1))
    c8 = jax.jit(lambda x, i: chain(8, x, i))
    c72 = jax.jit(lambda x, i: chain(72, x, i))
    float(c8(xb, ib)[0]); float(c72(xb, ib)[0])
    t8 = t72 = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(c8(xb, ib)[0])
        t8 = min(t8, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c72(xb, ib)[0])
        t72 = min(t72, time.perf_counter() - t0)
    us = (t72 - t8) / 64 * 1e6
    ng = G * S * L
    print(f"taa-lane scale: correct={ok} {us:.1f} us per {ng} gathers "
          f"= {us * 1e3 / ng:.3f} ns/elem")
except Exception as e:
    print(f"taa-lane scale: FAIL {type(e).__name__}: {str(e)[:140]}")
