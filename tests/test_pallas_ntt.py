"""Pallas fused NTT kernel vs the flat reference kernel — bit-exact
(interpret mode on CPU; the same parity is asserted on real TPU by the
perf harness)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from hetpu.core import nt, ntt4, pallas_ntt
from hetpu.core.modular import shoup_mul
from hetpu.core.ntt import build_tables, ntt_fwd, ntt_inv


@pytest.fixture(scope="module")
def setup():
    n = 1 << 12
    primes = nt.gen_primes(30, 2, 2 * n)
    return n, primes, ntt4.build_tables(n, primes), build_tables(n, primes)


def _rand(rng, primes, n, lead=()):
    return np.stack([rng.integers(0, q, (*lead, n), dtype=np.uint64)
                     .astype(np.uint32) for q in primes],
                    axis=len(lead))


def test_pallas_fwd_exact(setup, rng):
    n, primes, t4, tf = setup
    a = jnp.asarray(_rand(rng, primes, n, lead=(3,)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_ntt.ntt_fwd(a, t4))
    np.testing.assert_array_equal(got, np.asarray(ntt_fwd(a, tf)))


def test_pallas_fwd_mont_exact(setup, rng):
    n, primes, t4, tf = setup
    a = jnp.asarray(_rand(rng, primes, n))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_ntt.ntt_fwd(a, t4, to_mont=True))
    want = np.asarray(shoup_mul(ntt_fwd(a, tf), tf.r, tf.r_shoup, tf.q))
    np.testing.assert_array_equal(got, want)


def test_pallas_inv_exact(setup, rng):
    n, primes, t4, tf = setup
    a = jnp.asarray(_rand(rng, primes, n, lead=(2,)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_ntt.ntt_inv(a, t4))
        got_s = np.asarray(pallas_ntt.ntt_inv(a, t4, strip_mont=True))
    np.testing.assert_array_equal(got, np.asarray(ntt_inv(a, tf)))
    np.testing.assert_array_equal(
        got_s, np.asarray(ntt_inv(a, tf, strip_mont=True)))
