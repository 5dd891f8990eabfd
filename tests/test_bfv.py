"""BFV exact-arithmetic tests — EXACT equality against integer math
(replacing SEAL's own guarantees; reference BFV demos + noise budgets,
``matrix_operations.cpp:140-209, 351-493, 631-743``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hetpu.bfv import BfvSession
from hetpu.core.bfv import fbc_apply, make_fbc
from hetpu.core import nt

SEED = b"\x07" * 32


@pytest.fixture(scope="module")
def sess():
    return BfvSession.create("test_bfv_tiny", seed=SEED, galois_steps=[1, 2])


def test_fbc_exact(rng):
    """Fast base conversion vs big-int reference on centered values."""
    src = nt.gen_primes(26, 3, 2048)
    dst = nt.gen_primes(28, 4, 2048)
    plan = make_fbc(src, dst)
    import random as pyrandom
    pr = pyrandom.Random(0)
    P = 1
    for p in src:
        P *= int(p)
    vals = [pr.randrange(-P // 2 + 1, P // 2) for _ in range(64)]
    x = np.stack([[v % p for v in vals] for p in src]).astype(np.uint32)
    got = np.asarray(fbc_apply(jnp.asarray(x), plan))
    for j, r in enumerate(dst):
        want = np.array([v % r for v in vals], dtype=np.uint32)
        np.testing.assert_array_equal(got[j], want)


def test_encode_decode(sess, rng):
    t = sess.ctx.params.plain_modulus
    v = rng.integers(0, t, sess.slots, dtype=np.int64)
    pt = sess.encode(v)
    # decode via the t-domain poly: invert through encrypt-free path
    back = sess.decrypt(sess.encrypt(v))
    np.testing.assert_array_equal(back, v)


def test_encrypt_decrypt_and_budget(sess, rng):
    t = sess.ctx.params.plain_modulus
    v = rng.integers(0, t, sess.slots, dtype=np.int64)
    ct = sess.encrypt(v)
    assert sess.noise_budget(ct) > 20
    np.testing.assert_array_equal(sess.decrypt(ct), v)


def test_add_sub_neg(sess, rng):
    t = sess.ctx.params.plain_modulus
    a = rng.integers(0, t, sess.slots, dtype=np.int64)
    b = rng.integers(0, t, sess.slots, dtype=np.int64)
    ca, cb = sess.encrypt(a), sess.encrypt(b)
    np.testing.assert_array_equal(sess.decrypt(sess.add(ca, cb)), (a + b) % t)
    np.testing.assert_array_equal(sess.decrypt(sess.sub(ca, cb)), (a - b) % t)
    np.testing.assert_array_equal(sess.decrypt(sess.negate(ca)), (-a) % t)


def test_plain_ops(sess, rng):
    t = sess.ctx.params.plain_modulus
    a = rng.integers(0, t, sess.slots, dtype=np.int64)
    b = rng.integers(0, t, sess.slots, dtype=np.int64)
    ca, pb = sess.encrypt(a), sess.encode(b)
    np.testing.assert_array_equal(sess.decrypt(sess.add_plain(ca, pb)),
                                  (a + b) % t)
    np.testing.assert_array_equal(sess.decrypt(sess.sub_plain(ca, pb)),
                                  (a - b) % t)
    np.testing.assert_array_equal(sess.decrypt(sess.multiply_plain(ca, pb)),
                                  (a * b) % t)


def test_multiply_relin(sess, rng):
    """HPS ct·ct multiply, exact (reference elemwise_square demo with
    budget probes)."""
    t = sess.ctx.params.plain_modulus
    a = rng.integers(0, t, sess.slots, dtype=np.int64)
    b = rng.integers(0, t, sess.slots, dtype=np.int64)
    ca, cb = sess.encrypt(a), sess.encrypt(b)
    before = sess.noise_budget(ca)
    prod = sess.multiply_relin(ca, cb)
    after = sess.noise_budget(prod)
    assert 0 < after < before
    np.testing.assert_array_equal(sess.decrypt(prod), (a * b) % t)


def test_multiply_depth2(sess, rng):
    t = sess.ctx.params.plain_modulus
    a = rng.integers(0, t, sess.slots, dtype=np.int64)
    ca = sess.encrypt(a)
    sq = sess.square_relin(ca)
    np.testing.assert_array_equal(sess.decrypt(sq), (a * a) % t)
    # matpow-style: a^4 = (a²)² — needs budget for depth 2
    if sess.noise_budget(sq) > 30:
        q = sess.square_relin(sq)
        np.testing.assert_array_equal(sess.decrypt(q), (a ** 4) % t)


def test_rotations(sess, rng):
    """rotate_rows / rotate_columns (SEAL batching semantics)."""
    t = sess.ctx.params.plain_modulus
    half = sess.slots // 2
    v = rng.integers(0, t, sess.slots, dtype=np.int64)
    ct = sess.encrypt(v)
    got = sess.decrypt(sess.rotate_rows(ct, 1))
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(got, want)
    got = sess.decrypt(sess.rotate_columns(ct))
    np.testing.assert_array_equal(got, np.concatenate([v[half:], v[:half]]))
