"""Fast-base-conversion α-correction: adversarial near-half-integer cases
(VERDICT r1 weak-5: justify the f32 bound / provide an exactness-grade
path).  Exact reference math via Python big ints.

Math: with premultiplied digits y_i ∈ [0, p_i), the lift s = Σ y_i·(P/p_i)
satisfies s ≡ v (mod P) and s/P = Σ y_i/p_i.  Centered FBC returns
(s − round(s/P)·P) mod r — so exact expectations are computable for ANY
digit combination, letting us craft Σ y_i/p_i arbitrarily close to a
half-integer (the worst case for the float α)."""

from fractions import Fraction
import random

import numpy as np
import jax.numpy as jnp
import pytest

from hetpu.core import nt
from hetpu.core.modular import shoup_precompute, shoup_mul
from hetpu.core.rns import fbc_apply, make_fbc


@pytest.fixture(scope="module")
def bases():
    src = nt.gen_primes(30, 6, 2 * 64)
    dst = [p for p in nt.gen_primes(29, 8, 2 * 64) if p not in src][:4]
    return src, dst


def _digits_to_input(y, src, n):
    """Premultiplied digits y_i → the raw fbc input x_i with x_i·P̂ᵢ⁻¹ ≡ y_i
    (undo the premultiply so fbc_apply's own premul reproduces y)."""
    P = 1
    for p in src:
        P *= p
    x = np.zeros((len(src), n), dtype=np.uint32)
    for i, p in enumerate(src):
        phat = (P // p) % p
        x[i, :] = (y[i] * phat) % p
    return jnp.asarray(x)


def _expected(y, src, dst):
    """Exact centered conversion of the digit vector y."""
    P = 1
    for p in src:
        P *= p
    s = sum(int(y[i]) * (P // p) for i, p in enumerate(src))
    frac = Fraction(s, P)
    alpha = int(frac) + (1 if frac - int(frac) >= Fraction(1, 2) else 0)
    v = s - alpha * P
    return np.array([v % r for r in dst], dtype=np.uint32), frac - alpha


def _craft_near_half(src, seed, want=8):
    """Digit vectors with Σ y_i/p_i within ~2/p_last of a half-integer
    (but NOT exactly on it — exact ties are ambiguous by definition)."""
    rng = random.Random(seed)
    out = []
    L = len(src)
    while len(out) < want:
        y = [rng.randrange(p) for p in src[:-1]]
        p_last = src[-1]
        frac = sum(Fraction(yi, p) for yi, p in zip(y, src[:-1]))
        target = frac + Fraction(1, 2)
        # choose y_last so the total lands just past the half boundary
        y_last = (-(target.numerator * p_last) // target.denominator) % p_last
        for cand in (y_last, (y_last + 1) % p_last):
            tot = frac + Fraction(cand, p_last)
            d = tot - int(tot) - Fraction(1, 2)
            if d != 0 and abs(d) < Fraction(2, p_last):
                out.append(y + [cand])
                break
    return out


def test_fbc_precise_near_half(bases):
    """Σ y_i/p_i within ~2^-29 of a half-integer: plain f32 may mis-round
    (±P, absorbed as noise by design); the precise two-float path must
    round exactly."""
    src, dst = bases
    plan = make_fbc(src, dst)
    n = 8
    for y in _craft_near_half(src, seed=1):
        x = _digits_to_input(y, src, n)
        got = np.asarray(fbc_apply(x, plan, correct=True, precise=True))
        want, margin = _expected(y, src, dst)
        for j, r in enumerate(dst):
            np.testing.assert_array_equal(
                got[j], np.full(n, want[j]),
                err_msg=f"digits={y} margin={float(margin):.2e} dst={r}")


def test_fbc_f32_bounded_misround(bases):
    """The default f32 path: every output is the exact conversion OR the
    exact one shifted by ±P (the documented ±1-after-divide noise bound) —
    never anything else, even on adversarial boundary digits."""
    src, dst = bases
    plan = make_fbc(src, dst)
    P = 1
    for p in src:
        P *= p
    rng = random.Random(7)
    digit_sets = [[rng.randrange(p) for p in src] for _ in range(50)]
    digit_sets += _craft_near_half(src, seed=2)
    n = 4
    for y in digit_sets:
        x = _digits_to_input(y, src, n)
        got = np.asarray(fbc_apply(x, plan, correct=True))[:, 0]
        s = sum(int(y[i]) * (P // p) for i, p in enumerate(src))
        alpha = round(Fraction(s, P))
        shifted = lambda k: np.array([(s - k * P) % r for r in dst],
                                     dtype=np.uint32)
        assert any(np.array_equal(got, shifted(alpha + d))
                   for d in (-1, 0, 1)), f"digits={y}: {got}"


def test_fbc_precise_random_exact(bases):
    src, dst = bases
    plan = make_fbc(src, dst)
    rng = random.Random(3)
    n = 4
    for _ in range(100):
        y = [rng.randrange(p) for p in src]
        x = _digits_to_input(y, src, n)
        got = np.asarray(fbc_apply(x, plan, correct=True, precise=True))[:, 0]
        want, _ = _expected(y, src, dst)
        np.testing.assert_array_equal(got, want, err_msg=f"digits={y}")
