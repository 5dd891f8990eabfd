"""Operator DSL parity (reference he_operators.h/cpp expression surface)."""

import numpy as np
import pytest

from hetpu.ops import HE
from hetpu.session import Session
from hetpu.utils.keycache import cached_session

SEED = b"\x0a" * 32


@pytest.fixture(scope="module")
def sess():
    return cached_session("test_tiny", seed=SEED, galois_steps=[1, 2, -1])


def test_dsl_arithmetic(sess, rng):
    x = rng.uniform(-1, 1, sess.slots)
    y = rng.uniform(-1, 1, sess.slots)
    ex = HE(sess, sess.encrypt(x))
    ey = HE(sess, sess.encrypt(y))
    np.testing.assert_allclose((ex + ey).decrypt().real, x + y, atol=1e-4)
    np.testing.assert_allclose((ex - ey).decrypt().real, x - y, atol=1e-4)
    np.testing.assert_allclose((-ex).decrypt().real, -x, atol=1e-4)
    np.testing.assert_allclose((ex + 0.5).decrypt().real, x + 0.5, atol=1e-4)
    # * & ^ : multiply, relinearize, rescale — the reference's hot combo
    prod = ((ex * ey) & sess.rk) ^ 1
    np.testing.assert_allclose(prod.decrypt().real, x * y, atol=1e-3)
    np.testing.assert_allclose((ex * 2.0).decrypt().real, 2 * x, atol=1e-3)


def test_dsl_maintenance_and_rotation(sess, rng):
    z = rng.uniform(-1, 1, sess.slots)
    ez = HE(sess, sess.encrypt(z))
    dropped = ez | 1                       # mod_switch_to_next
    assert dropped.ct.level == ez.ct.level - 1
    np.testing.assert_allclose(dropped.decrypt().real, z, atol=1e-4)
    np.testing.assert_allclose((ez << 2).decrypt().real, np.roll(z, -2),
                               atol=1e-4)
    np.testing.assert_allclose((ez >> 1).decrypt().real, np.roll(z, 1),
                               atol=1e-4)
