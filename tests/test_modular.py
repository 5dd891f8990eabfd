"""Bit-exact tests of the uint32 modular kernels against Python big-int math."""

import numpy as np
import jax.numpy as jnp

from hetpu.core import modular as M


PRIMES = [(1 << 31) - 2**17 + 1]  # not nec. prime; magnitude test only


def _rand_u32(rng, n, hi=1 << 32):
    return rng.integers(0, hi, size=n, dtype=np.uint64).astype(np.uint32)


def test_mulhi_exact(rng):
    a = _rand_u32(rng, 4096)
    b = _rand_u32(rng, 4096)
    # include boundary values
    a[:4] = [0xFFFFFFFF, 0, 1, 0xFFFF0001]
    b[:4] = [0xFFFFFFFF, 0xFFFFFFFF, 1, 0xFFFF0001]
    got = np.asarray(M.mulhi_u32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_mont_mul_exact(rng):
    from hetpu.core.nt import gen_primes

    for q in gen_primes(31, 2, 1 << 12) + gen_primes(30, 2, 1 << 12):
        c = M.mont_constants([q])
        a = _rand_u32(rng, 2048, q)
        b = _rand_u32(rng, 2048, q)
        got = np.asarray(
            M.mont_mul(jnp.asarray(a), jnp.asarray(b), np.uint32(q), c["qinv_neg"][0, 0])
        )
        Rinv = pow(1 << 32, -1, q)
        want = (a.astype(object) * b.astype(object) * Rinv % q).astype(np.uint32)
        np.testing.assert_array_equal(got, want)


def test_shoup_mul_exact(rng):
    from hetpu.core.nt import gen_primes

    for q in gen_primes(31, 1, 1 << 12) + gen_primes(26, 1, 1 << 12):
        w = _rand_u32(rng, 2048, q)
        w_shoup = np.asarray(
            M.shoup_precompute(w, np.array([q], dtype=np.uint32))
        )
        x = _rand_u32(rng, 2048, q)
        got = np.asarray(M.shoup_mul(jnp.asarray(x), w, w_shoup, np.uint32(q)))
        want = (x.astype(object) * w.astype(object) % q).astype(np.uint32)
        np.testing.assert_array_equal(got, want)


def test_add_sub_neg(rng):
    q = 2147377153
    a = _rand_u32(rng, 2048, q)
    b = _rand_u32(rng, 2048, q)
    np.testing.assert_array_equal(
        np.asarray(M.mod_add(jnp.asarray(a), jnp.asarray(b), np.uint32(q))),
        ((a.astype(np.uint64) + b) % q).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(M.mod_sub(jnp.asarray(a), jnp.asarray(b), np.uint32(q))),
        ((a.astype(np.int64) - b + q) % q).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(M.mod_neg(jnp.asarray(a), np.uint32(q))),
        ((q - a.astype(np.int64)) % q).astype(np.uint32),
    )


def test_barrett_reduce(rng):
    from hetpu.core.nt import gen_primes

    for q in gen_primes(31, 1, 1 << 12) + gen_primes(20, 1, 1 << 12):
        c = M.mont_constants([q])
        x = _rand_u32(rng, 4096)
        got = np.asarray(M.barrett_reduce_u32(jnp.asarray(x), np.uint32(q), c["mu"][0, 0]))
        np.testing.assert_array_equal(got, (x % q).astype(np.uint32))


def test_mont_roundtrip(rng):
    from hetpu.core.nt import gen_primes

    primes = gen_primes(30, 3, 1 << 12)
    c = M.mont_constants(primes)
    a = np.stack([_rand_u32(rng, 256, q) for q in primes])
    am = M.to_mont(jnp.asarray(a), c)
    back = np.asarray(M.from_mont(am, c))
    np.testing.assert_array_equal(back, a)
