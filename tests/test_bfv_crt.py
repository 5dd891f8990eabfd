"""BFV at reference capability scale: CRT plaintext modulus (60-bit
batching parity, ``matrix_operations.cpp:360-361``), dropped-level
multiply, modulus switching, and the non-batching t = 2^k coefficient
path (matpow demo semantics, ``matrix_operations.cpp:640-641``).
All checks are EXACT integer equality."""

import numpy as np
import pytest

from hetpu.bfv import BfvSession

SEED = b"\x0b" * 32


@pytest.fixture(scope="module")
def crt():
    return BfvSession.create("test_bfv_crt", seed=SEED, galois_steps=[1])


@pytest.fixture(scope="module")
def scal():
    return BfvSession.create("test_bfv_scalar", seed=SEED, galois_steps=[1])


def _arr(x):
    return np.array([int(v) for v in x], dtype=object)


def test_crt_params(crt):
    p = crt.ctx.params
    assert len(p.plain_factors) == 2
    assert p.plain_modulus == p.plain_factors[0] * p.plain_factors[1]
    assert p.plain_modulus.bit_length() >= 33


def test_crt_roundtrip(crt, rng):
    t = crt.ctx.params.plain_modulus
    v = np.array([int(rng.integers(0, 1 << 62)) % t
                  for _ in range(crt.slots)], dtype=object)
    np.testing.assert_array_equal(_arr(crt.decrypt(crt.encrypt(v))), v)


def test_crt_mult_exact(crt, rng):
    t = crt.ctx.params.plain_modulus
    a = np.array([int(x) % t for x in rng.integers(0, 1 << 62, crt.slots)],
                 dtype=object)
    b = np.array([int(x) % t for x in rng.integers(0, 1 << 62, crt.slots)],
                 dtype=object)
    prod = crt.multiply_relin(crt.encrypt(a), crt.encrypt(b))
    assert crt.noise_budget(prod) > 0
    np.testing.assert_array_equal(_arr(crt.decrypt(prod)), (a * b) % t)


def test_mod_switch_exact(crt, rng):
    t = crt.ctx.params.plain_modulus
    v = np.array([int(x) % t for x in rng.integers(0, 1 << 62, crt.slots)],
                 dtype=object)
    ct = crt.encrypt(v)
    down = crt.mod_switch(ct)
    assert down.level == ct.level - 1
    assert crt.noise_budget(down) > 0
    np.testing.assert_array_equal(_arr(crt.decrypt(down)), v)


def test_multiply_at_dropped_level(crt, rng):
    """The round-2 gap: multiply below top level (core/bfv.py used to
    raise NotImplementedError)."""
    t = crt.ctx.params.plain_modulus
    a = np.array([int(x) % t for x in rng.integers(0, 1 << 62, crt.slots)],
                 dtype=object)
    b = np.array([int(x) % t for x in rng.integers(0, 1 << 62, crt.slots)],
                 dtype=object)
    ca = crt.mod_switch(crt.encrypt(a))
    cb = crt.mod_switch(crt.encrypt(b))
    assert ca.level == crt.ctx.num_data - 2
    prod = crt.multiply_relin(ca, cb)
    assert crt.noise_budget(prod) > 0
    np.testing.assert_array_equal(_arr(crt.decrypt(prod)), (a * b) % t)


def test_matpow_chain_with_mod_switch(crt, rng):
    """A^4-style square/square with a mod_switch between: the reference
    matpow demo's binary-exponentiation semantics at depth 2."""
    t = crt.ctx.params.plain_modulus
    a = np.array([int(x) % (1 << 16) for x in rng.integers(0, 1 << 16,
                                                           crt.slots)],
                 dtype=object)
    ct = crt.encrypt(a)
    sq = crt.square_relin(ct)
    sq = crt.mod_switch(sq)
    q4 = crt.square_relin(sq)
    assert crt.noise_budget(q4) > 0
    np.testing.assert_array_equal(_arr(crt.decrypt(q4)), (a ** 4) % t)


# ----------------------------------------------------------------------
# non-batching coefficient path (t = 2^20)
# ----------------------------------------------------------------------

def test_scalar_roundtrip(scal, rng):
    t = scal.ctx.params.plain_modulus
    assert t == 1 << 20 and not scal.ctx.params.plain_batching
    v = np.array([int(x) % t for x in rng.integers(0, t, 8)], dtype=object)
    got = _arr(scal.decrypt(scal.encrypt(v)))[: 8]
    np.testing.assert_array_equal(got, v)


def test_scalar_constant_multiply(scal, rng):
    """Scalar-in-coefficient-0 products (element-per-ct Matrix semantics:
    each ciphertext holds ONE integer)."""
    t = scal.ctx.params.plain_modulus
    x, y = 12345, 54321
    cx = scal.encrypt([x])
    cy = scal.encrypt([y])
    prod = scal.multiply_relin(cx, cy)
    got = _arr(scal.decrypt(prod))
    assert int(got[0]) == (x * y) % t
    # all other coefficients stay zero (single-coefficient operands)
    assert all(int(c) == 0 for c in got[1:])


def test_multiply_kpart(crt, rng):
    """Deferred-relin chain: (a·b) [3-part] × c [2-part] → 4-part ct whose
    s³ term must survive the HPS tensor (general part-wise convolution —
    regression for the 2-part-only tensor() that silently dropped part 2)."""
    t = crt.ctx.params.plain_modulus
    a = rng.integers(0, t, crt.slots, dtype=np.int64)
    b = rng.integers(0, t, crt.slots, dtype=np.int64)
    c = rng.integers(0, t, crt.slots, dtype=np.int64)
    c3 = crt.multiply(crt.encrypt(a), crt.encrypt(b))    # 3 parts
    assert c3.num_parts == 3
    d = crt.scheme.multiply(c3, crt.encrypt(c), crt.ev)  # 4 parts
    assert d.num_parts == 4
    assert crt.noise_budget(d) > 0
    got = crt.scheme.decrypt(d, crt.sk_data)
    want = (a.astype(object) * b % t) * c % t
    np.testing.assert_array_equal(got, want)


def test_crt_lift_auto_matches_full(crt, rng):
    """crt_lift_auto (adaptive limb escalation, VERDICT r5) equals the
    exact full lift for small, medium, and full-range values."""
    ctx = crt.ctx
    lvl = ctx.num_data - 1
    primes = ctx.params.moduli[: lvl + 1]
    n = 64
    Q = 1
    for q in primes:
        Q *= q
    for hi in (1 << 16, 1 << 60, Q - 1):
        vals = [int(rng.integers(0, min(hi, 1 << 62))) for _ in range(n)]
        vals[0] = hi - 1 if hi > 1 else 0
        res = np.stack([np.array([v % q for v in vals], dtype=np.uint32)
                        for q in primes])
        want = ctx.crt_lift(res, lvl)
        got = ctx.crt_lift_auto(res, lvl)
        assert all(int(a) == int(b) for a, b in zip(got, want))
