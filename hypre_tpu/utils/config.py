"""Build/runtime configuration (the HYPRE_config.h / configure-flag analog).

The reference configures precision and index width at compile time
(--enable-single / --enable-longdouble / --enable-bigint, SURVEY §5).  Here
they are a runtime dataclass; everything downstream asks this module for
dtypes instead of hardcoding them.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Config:
    real: str = "float64"  # "float32" | "float64" (hypre default: double)
    integer: str = "int32"  # local indices; global index always int64
    # Pallas/TPU tiling knobs
    spmv_row_block: int = 256  # rows per SpMV grid step
    lane: int = 128  # TPU lane width

    @property
    def real_dtype(self):
        return jnp.dtype(self.real)

    @property
    def int_dtype(self):
        return jnp.dtype(self.integer)

    @property
    def np_real(self):
        return np.dtype(self.real)


_default = Config()


def default_config() -> Config:
    return _default


def set_default_config(cfg: Config) -> None:
    global _default
    _default = cfg


def real_dtype():
    return _default.real_dtype


def int_dtype():
    return _default.int_dtype
