"""Example 1 (reference: examples/ex1.c).

2-D 5-point Laplacian on a 2-box struct grid, solved with PFMG.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax.numpy as jnp

    import hypre_tpu  # noqa: F401
    from hypre_tpu.struct import StructGrid, StructMatrix
    from hypre_tpu.solvers.struct_ls import PFMG, PFMGOptions

    shape = (32, 32)
    ones = np.ones(shape)
    A = StructMatrix.from_dict(
        {(0, 0): 4.0 * ones, (-1, 0): -ones, (1, 0): -ones,
         (0, -1): -ones, (0, 1): -ones},
        StructGrid(shape),
    )
    res = PFMG(A, PFMGOptions(tol=1e-6, skip_relax=0)).solve(jnp.ones(shape))
    print(f"Iterations = {int(res.num_iterations)}")
    print(f"Final Relative Residual Norm = {float(res.rel_residual_norm):e}")
    return res


if __name__ == "__main__":
    main()
