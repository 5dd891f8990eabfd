"""Iterative encrypted math vs numpy — the reference's client/server math
workloads (``client.cpp`` inv / inv_sqrt_twice / abs / twice_max demos) as
tolerance tests."""

import numpy as np
import pytest

from hetpu import math as hemath
from hetpu.session import Session
from hetpu.utils.keycache import cached_session

SEED = b"\x03" * 32


@pytest.fixture(scope="module")
def sess():
    return cached_session("test_deep", seed=SEED, galois_steps=[1])


def test_signed_inv(sess, rng):
    """1/x, product-form iteration (reference he_math.cpp:22-90; demo
    client.cpp:321-426 uses a=0.05, 6 iters on larger values)."""
    x = rng.uniform(0.5, 1.5, sess.slots)
    ct = sess.encrypt(x)
    got = sess.decrypt(hemath.signed_inv(sess, ct, 0.8, 6)).real
    np.testing.assert_allclose(got, 1 / x, rtol=2e-3)


def test_inv_sqrt_twice(sess, rng):
    """1/√(2x) Newton iteration (reference he_math.cpp:92-203)."""
    x = rng.uniform(0.4, 0.7, sess.slots)
    ct = sess.encrypt(x)
    got = sess.decrypt(hemath.inv_sqrt_twice(sess, ct, 1.0, 4)).real
    np.testing.assert_allclose(got, 1 / np.sqrt(2 * x), rtol=5e-3)


def test_sqrt(sess, rng):
    x = rng.uniform(0.4, 0.9, sess.slots)
    ct = sess.encrypt(x)
    got = sess.decrypt(hemath.sqrt(sess, ct, 1.0, 4)).real
    np.testing.assert_allclose(got, np.sqrt(x), rtol=5e-3)


def test_abs(sess, rng):
    x = rng.uniform(0.5, 1.0, sess.slots) * rng.choice([-1, 1], sess.slots)
    ct = sess.encrypt(x)
    got = sess.decrypt(hemath.abs_(sess, ct, 1.0, 4)).real
    np.testing.assert_allclose(got, np.abs(x), rtol=1e-2)


def test_twice_max(sess, rng):
    """(x₁+x₂)+|x₁−x₂| = 2·max (reference twice_max, client.cpp:640-747).
    The |·| Newton guess must satisfy a < √1.5/|x₁−x₂| (he_math.h domain
    contract), so the test draws differences inside that basin — the
    reference demo likewise picks inputs matched to its hardcoded guess."""
    base = rng.uniform(-0.5, 0.5, sess.slots)
    diff = rng.uniform(0.6, 1.0, sess.slots) * rng.choice([-1, 1], sess.slots)
    x1, x2 = base + diff / 2, base - diff / 2
    c1, c2 = sess.encrypt(x1), sess.encrypt(x2)
    got = sess.decrypt(hemath.twice_max(sess, c1, c2, 1.0, 4)).real
    want = 2 * np.maximum(x1, x2)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    got_max = sess.decrypt(hemath.max_(sess, c1, c2, 1.0, 4)).real
    np.testing.assert_allclose(got_max, np.maximum(x1, x2),
                               rtol=2e-2, atol=2e-2)
