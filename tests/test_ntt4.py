"""Four-step NTT must be bit-exact vs the flat kernel (same ordering)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hetpu.core import nt
from hetpu.core import ntt as flat
from hetpu.core import ntt4


@pytest.mark.parametrize("n", [4096, 16384])
def test_four_step_matches_flat(n, rng):
    primes = nt.gen_primes(30, 2, 2 * n)
    tf = flat.build_tables(n, primes)
    t4 = ntt4.build_tables(n, primes)
    a = np.stack([rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
                  for q in primes])
    want = np.asarray(flat.ntt_fwd(jnp.asarray(a), tf))
    got = np.asarray(ntt4.ntt_fwd(jnp.asarray(a), t4))
    np.testing.assert_array_equal(got, want)
    # inverse: roundtrip + match flat inverse on arbitrary eval-domain data
    back = np.asarray(ntt4.ntt_inv(jnp.asarray(got), t4))
    np.testing.assert_array_equal(back, a)
    want_inv = np.asarray(flat.ntt_inv(jnp.asarray(a), tf))
    got_inv = np.asarray(ntt4.ntt_inv(jnp.asarray(a), t4))
    np.testing.assert_array_equal(got_inv, want_inv)


def test_four_step_strip_mont(rng):
    n = 4096
    primes = nt.gen_primes(30, 2, 2 * n)
    tf = flat.build_tables(n, primes)
    t4 = ntt4.build_tables(n, primes)
    a = np.stack([rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
                  for q in primes])
    want = np.asarray(flat.ntt_inv(jnp.asarray(a), tf, strip_mont=True))
    got = np.asarray(ntt4.ntt_inv(jnp.asarray(a), t4, strip_mont=True))
    np.testing.assert_array_equal(got, want)
    # batched leading dims
    ab = jnp.asarray(np.stack([a, a]))
    got_b = np.asarray(ntt4.ntt_fwd(ab, t4))
    want_b = np.asarray(flat.ntt_fwd(ab, tf))
    np.testing.assert_array_equal(got_b, want_b)
