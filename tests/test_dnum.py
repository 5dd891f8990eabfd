"""Generalized hybrid key-switch (dnum): α=3 special primes, multi-prime
digits — relin, rotation (incl. hoisted), conjugation, and level descent
must all stay correct."""

import numpy as np
import pytest

from hetpu.session import Session
from hetpu.utils.keycache import cached_session

SEED = b"\x08" * 32


@pytest.fixture(scope="module")
def sess():
    return cached_session("test_dnum", seed=SEED, galois_steps=[1, 2, 3])


def test_digit_partition(sess):
    plan = sess.ctx.keyswitch_plan(sess.ctx.num_data - 1)
    assert plan.alpha == 3
    assert plan.num_digits == -(-sess.ctx.num_data // 3)


def test_relin_dnum(sess, rng):
    x = rng.uniform(-1, 1, sess.slots)
    y = rng.uniform(-1, 1, sess.slots)
    cx, cy = sess.encrypt(x), sess.encrypt(y)
    got = sess.decrypt(sess.ev.multiply_relin_rescale(cx, cy, sess.rk)).real
    np.testing.assert_allclose(got, x * y, atol=2e-3)


def test_relin_at_lower_levels(sess, rng):
    """Partial last digit: levels where (ℓ+1) % α != 0."""
    x = rng.uniform(-1, 1, sess.slots)
    ct = sess.encrypt(x)
    for _ in range(4):                       # walk levels 7→4
        ct = sess.ev.mod_switch(ct)
        sq = sess.ev.square_relin_rescale(ct, sess.rk)
        np.testing.assert_allclose(sess.decrypt(sq).real, x * x, atol=5e-3)


def test_rotate_dnum(sess, rng):
    z = rng.uniform(-1, 1, sess.slots)
    ct = sess.encrypt(z)
    got = sess.decrypt(sess.ev.rotate(ct, 2, sess.gk)).real
    np.testing.assert_allclose(got, np.roll(z, -2), atol=1e-3)
    got = sess.decrypt(sess.ev.conjugate(ct, sess.gk))
    np.testing.assert_allclose(got.real, z, atol=1e-3)


def test_rotate_hoisted_dnum(sess, rng):
    z = rng.uniform(-1, 1, sess.slots)
    ct = sess.encrypt(z)
    outs = sess.ev.rotate_hoisted(ct, [1, 2, 3], sess.gk)
    for k, out in zip([1, 2, 3], outs):
        np.testing.assert_allclose(sess.decrypt(out).real, np.roll(z, -k),
                                   atol=1e-3)
