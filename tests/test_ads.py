"""ADS face-element divergence solver (reference: ads.c).

At balanced alpha/beta the auxiliary-space correction is essentially a
direct solver (1-2 PCG iterations vs ~30 diagonal-scaled).  The
small-beta (near-singular curl-space) regime needs the reference's
extra AMS robustness options — tracked as future tuning.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hypre_tpu.models.maxwell import divdiv_matrix
from hypre_tpu.ops.dia import freeze_auto, spmv
from hypre_tpu.solvers.amg.ads import ADS
from hypre_tpu.solvers.krylov import PCGOptions, pcg


@pytest.mark.slow
def test_ads_pcg_beats_diag():
    A, C, Pi, G, coords = divdiv_matrix(6, 6, 6, alpha=1.0, beta=1.0)
    n = A.num_rows
    rng = np.random.default_rng(0)
    b_host = rng.standard_normal(n)
    b = jnp.asarray(b_host)
    ads = ADS(A, C, Pi, G, coords)
    res = ads.solve(b, tol=1e-8, max_iter=100)
    assert bool(res.converged)

    E = freeze_auto(A)
    dinv = jnp.asarray(1.0 / A.diagonal())
    res_d = pcg(lambda x: spmv(E, x), b, M=lambda r: dinv * r,
                opts=PCGOptions(tol=1e-8, max_iter=500))
    assert int(res.num_iterations) < int(res_d.num_iterations) / 3
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b_host)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-8)
