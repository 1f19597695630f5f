"""LCG parity with the reference RNG (utilities/random.c)."""

import numpy as np

from hypre_tpu.utils import HypreLCG, lcg_fill, lcg_skip


def test_park_miller_canonical():
    # The canonical Park-Miller check: from seed 1, the 10000th draw
    # is 1043618065 (Park & Miller, CACM 31(10), 1988).
    rng = HypreLCG(1)
    for _ in range(10000):
        v = rng.rand_i()
    assert v == 1043618065


def test_scalar_matches_schrage_form():
    # Reimplement the reference's Schrage-trick update literally and
    # compare with our multiplicative form.
    a, m, q, r = 16807, 2147483647, 127773, 2836
    seed = 2747
    rng = HypreLCG(seed)
    s = seed
    for _ in range(1000):
        high, low = divmod(s, q)
        t = a * low - r * high
        s = t if t > 0 else t + m
        assert rng.rand_i() == s


def test_fill_matches_scalar():
    rng = HypreLCG(2747)
    expect = np.array([rng.rand() for _ in range(257)])
    got = lcg_fill(2747, 257)
    np.testing.assert_allclose(got, expect, rtol=0, atol=0)


def test_fill_with_skip():
    # The distributed seq_rand path: rank owning rows [k, k+n) takes
    # draws k..k+n-1 of the same global sequence (par_indepset.c:52-56).
    full = lcg_fill(2747, 100)
    part = lcg_fill(2747, 40, skip=37)
    np.testing.assert_array_equal(part, full[37:77])


def test_skip_zero_is_seed():
    assert lcg_skip(12345, 0) == 12345
    rng = HypreLCG(12345)
    rng.rand_i()
    assert lcg_skip(12345, 1) == rng.state


def test_seed_clamping():
    assert HypreLCG(0).state == 1
    assert HypreLCG(-5).state == 1
    assert HypreLCG(2**31 - 1).state == 2**31 - 2
