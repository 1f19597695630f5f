"""Example 5 (reference: examples/ex5.c).

2-D 5-point Laplacian on an n x n grid (h = 1/(n+1)), assembled through
the IJ interface row by row, solved with BoomerAMG-preconditioned PCG.
Mirrors the reference's flow: Create/SetValues/Assemble -> solver
Create/SetPrecond/Setup/Solve -> GetNumIterations.

Run: python examples/ex5.py [-n N]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = 33
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])

    import jax.numpy as jnp

    import hypre_tpu  # noqa: F401
    from hypre_tpu.models.ij import IJMatrix, IJVector
    from hypre_tpu.ops.dia import freeze_auto, spmv
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions
    from hypre_tpu.solvers.krylov import PCGOptions, pcg

    N = n * n
    h = 1.0 / (n + 1)
    h2 = h * h

    # assemble row by row like ex5.c:141-219
    ij = IJMatrix(N, N)
    for i in range(N):
        cols, vals = [i], [4.0]
        if i >= n:
            cols.append(i - n); vals.append(-1.0)
        if i % n:
            cols.append(i - 1); vals.append(-1.0)
        if (i + 1) % n:
            cols.append(i + 1); vals.append(-1.0)
        if i + n < N:
            cols.append(i + n); vals.append(-1.0)
        ij.set_row(i, cols, vals)
    A = ij.assemble()

    rhs = IJVector(N)
    rhs.set_values(np.arange(N), np.full(N, h2))
    b = jnp.asarray(rhs.assemble())

    amg = BoomerAMG(
        A,
        BoomerAMGOptions(coarsen_type="pmis", interp_type="ext+i",
                         P_max_elmts=4, relax_down=18, relax_up=18),
    )
    E = freeze_auto(A)
    res = pcg(lambda x: spmv(E, x), b, M=amg.precond,
              opts=PCGOptions(tol=1e-7, max_iter=200, two_norm=True))

    print(f"Iterations = {int(res.num_iterations)}")
    print(f"Final Relative Residual Norm = {float(res.rel_residual_norm):e}")
    return res


if __name__ == "__main__":
    main()
