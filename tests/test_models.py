"""Flagship end-to-end pipeline: encrypted least-squares
(reference ``bench_he_least_squares_2d``, SURVEY.md §3.1 call stack)."""

import numpy as np
import pytest

from hetpu.models.least_squares import least_squares_2d
from hetpu.session import Session
from hetpu.utils.keycache import cached_session

SEED = b"\x06" * 32


def test_least_squares_2d(rng):
    sess = cached_session("test_deep", seed=SEED, galois_steps=[1, 2, 4])
    # 5 data points on a noisy line (reference uses 5 points)
    n = 5
    x = rng.uniform(0.5, 2.0, n)
    a_true, b_true = 0.7, 0.3
    y = a_true * x + b_true + rng.normal(0, 0.02, n)

    pad = np.zeros(sess.slots)
    pad[:n] = x
    cx = sess.encrypt(pad)
    pad2 = np.zeros(sess.slots)
    pad2[:n] = y
    cy = sess.encrypt(pad2)

    # plain-math reference (same formulas)
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    D = n * sxx - sx * sx
    a_want = (n * sxy - sx * sy) / D
    b_want = (sxx * sy - sx * sxy) / D

    # inversion guess: 0 < guess·D < 2
    ct_a, ct_b = least_squares_2d(sess, cx, cy, n, inv_guess=1.0 / D,
                                  inv_iters=4)
    a_got = sess.decrypt(ct_a).real[0]
    b_got = sess.decrypt(ct_b).real[0]
    np.testing.assert_allclose(a_got, a_want, rtol=1e-2)
    np.testing.assert_allclose(b_got, b_want, rtol=1e-2)
    np.testing.assert_allclose(a_got, a_true, atol=0.1)
