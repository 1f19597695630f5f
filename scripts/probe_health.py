"""30-second chip/tunnel health probe.

Times the marginal cost of chained fine-level SpMVs (the bench's own
methodology at 96^3 scale) plus one small-jit compile.  Healthy v5e:
~44 us/spmv (~730 GB/s, ~0.89 of roofline) and sub-2s small compiles.
Degraded states observed through the axon tunnel: 8x slower spmv
(~88 GB/s) and 100-800s compiles — do NOT trust any graded timing
taken in that state.

Usage: python scripts/probe_health.py [n]   (default n = 96^3)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) ** 3 if len(sys.argv) > 1 else 96 ** 3
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32)))
    print(f"backend init: {time.perf_counter() - t0:.1f}s "
          f"({jax.devices()[0].device_kind})")

    t0 = time.perf_counter()
    # fresh shape each run: a fixed 128 would hit the persistent cache
    # and measure deserialize, not the compile service
    odd = 16001 + (int(time.time()) % 9973) * 2
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    float(f(jnp.ones(odd))[0])
    compile_s = time.perf_counter() - t0
    print(f"small compile+run: {compile_s:.2f}s")

    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.ops.dia import freeze_auto, spmv

    nx = round(n ** (1 / 3))
    A = freeze_auto(laplacian_7pt(nx, nx, nx))
    x = jnp.ones(nx ** 3, jnp.float32)

    def chain(E, x, k):
        def body(i, x):
            return spmv(E, x) * jnp.asarray(1 / 7.0, x.dtype)

        return jax.lax.fori_loop(0, k, body, x)[:1]

    k1, k2 = 64, 576
    ca = jax.jit(lambda E, x: chain(E, x, k1))
    cb = jax.jit(lambda E, x: chain(E, x, k2))
    t0 = time.perf_counter()
    float(ca(A, x)[0]); float(cb(A, x)[0])
    print(f"spmv chains compile: {time.perf_counter() - t0:.1f}s")
    ta = tb = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(ca(A, x)[0])
        ta = min(ta, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(cb(A, x)[0])
        tb = min(tb, time.perf_counter() - t0)
    us = (tb - ta) / (k2 - k1) * 1e6
    gbs = (A.data.size * A.data.dtype.itemsize + 8 * nx ** 3) / (us / 1e6) / 1e9
    frac = gbs / 819.0
    state = "HEALTHY" if frac > 0.6 else ("DEGRADED" if frac < 0.3 else "marginal")
    if compile_s > 20.0:
        state = "DEGRADED(compile)"
    print(f"spmv: {us:.1f} us  {gbs:.0f} GB/s  roofline {frac:.2f}  -> {state}")
    # exit code for scripted gating (run_256_when_healthy.sh):
    # 0 = healthy tunnel AND compile service, nonzero otherwise
    sys.exit(0 if state == "HEALTHY" else 1)


if __name__ == "__main__":
    main()
