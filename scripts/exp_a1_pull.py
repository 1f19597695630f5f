"""Measure A1-pull strategies on the real TPU.

The device-setup chain must move the level-1 operator's values at the
C positions (nc of n rows, noff diagonals) to the host.  Candidates:
  a) per-offset 1D gather (one traced-k program, noff dispatches)
  b) chunked [8, nc] 2D advanced-index gather (current)
  c) row-take [noff, n] then column gather, one dispatch
  d) full-width pull: no gather at all, ship [noff, n] and compact on host
  e) mask-compaction: sort-based compaction along rows (no random gather)
Prints wall seconds per strategy at bench shapes.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import hypre_tpu  # noqa: F401
from hypre_tpu.ops.transfer import fast_device_put

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
n = nx ** 3
noff = 19
rng = np.random.default_rng(0)
cpos = np.sort(rng.choice(n, size=n // 5, replace=False)).astype(np.int64)
nc = len(cpos)
print(f"n={n} nc={nc} noff={noff}")

jax.block_until_ready(jax.device_put(np.zeros(8, np.float32)))
data = jax.block_until_ready(
    jax.jit(lambda: jnp.ones((noff, n), jnp.float32) * 1.5)())
cpos_dev = fast_device_put(cpos)


def timeit(name, fn, reps=2):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best:7.3f}s")
    return out


@jax.jit
def pull_1d(d, k, c):
    return jax.lax.dynamic_index_in_dim(d, k, 0, keepdims=False)[c]


@jax.jit
def pull_2d8(d, ks, c):
    return d[ks[:, None], c[None, :]]


@jax.jit
def pull_rows_then_cols(d, c):
    return d[:, c]


@jax.jit
def pull_onehot(d, c, n_):
    # compaction as dense matmul is O(n*nc) flops -- skip; instead
    # dynamic-slice based: not applicable for random cpos
    return d[:, c]


from functools import partial


@partial(jax.jit, static_argnames=("nc_",))
def pull_maskcompact(d, mask, nc_):
    # stable-partition by sort: key = ~mask (False first), payload rows
    key = (~mask).astype(jnp.int32)
    idx = jnp.argsort(key, stable=True)[:nc_]
    return d[:, idx]


# warm compiles
np.asarray(pull_1d(data, jnp.int32(0), cpos_dev))
ks = np.minimum(np.arange(8, dtype=np.int32), noff - 1)
np.asarray(pull_2d8(data, jnp.asarray(ks), cpos_dev))
np.asarray(pull_rows_then_cols(data, cpos_dev))
mask = np.zeros(n, bool); mask[cpos] = True
mask_dev = fast_device_put(mask)
np.asarray(pull_maskcompact(data, mask_dev, nc))

timeit("a) per-offset 1D gather", lambda: np.stack([
    np.asarray(pull_1d(data, jnp.int32(k), cpos_dev)) for k in range(noff)]))


def run_b():
    chunks = []
    for k0 in range(0, noff, 8):
        kk = np.minimum(np.arange(k0, k0 + 8, dtype=np.int32), noff - 1)
        chunks.append(np.asarray(pull_2d8(data, jnp.asarray(kk), cpos_dev)))
    return np.concatenate(chunks)[:noff]


timeit("b) chunked [8,nc] 2D gather", run_b)
timeit("c) all-rows col gather", lambda: np.asarray(
    pull_rows_then_cols(data, cpos_dev)))
timeit("d) full-width ship+host", lambda: np.asarray(data)[:, cpos])
timeit("e) sort-compaction", lambda: np.asarray(
    pull_maskcompact(data, mask_dev, nc)))
