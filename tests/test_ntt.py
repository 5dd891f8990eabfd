"""NTT correctness: inverse identity, negacyclic convolution vs exact
big-int reference, and output-ordering pin (needed by galois tables)."""

import numpy as np
import jax.numpy as jnp

from hetpu.core import nt
from hetpu.core.ntt import build_tables, ntt_fwd, ntt_inv


def _naive_negacyclic_mul(a, b, q):
    """Exact negacyclic convolution via Python ints: c = a*b mod (x^n+1, q)."""
    n = len(a)
    c = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            t = ai * int(b[j])
            if k < n:
                c[k] = (c[k] + t) % q
            else:
                c[k - n] = (c[k - n] - t) % q
    return np.array(c, dtype=np.uint32)


def test_ntt_roundtrip(rng):
    n = 256
    primes = nt.gen_primes(30, 3, 2 * n)
    t = build_tables(n, primes)
    a = np.stack(
        [rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32) for q in primes]
    )
    out = np.asarray(ntt_inv(ntt_fwd(jnp.asarray(a), t), t))
    np.testing.assert_array_equal(out, a)


def test_ntt_batched_roundtrip(rng):
    n = 64
    primes = nt.gen_primes(26, 2, 2 * n)
    t = build_tables(n, primes)
    a = rng.integers(0, primes[-1] - 1, size=(3, 2, len(primes), n), dtype=np.uint64)
    a = np.minimum(a, np.array(primes, dtype=np.uint64)[:, None] - 1).astype(np.uint32)
    out = np.asarray(ntt_inv(ntt_fwd(jnp.asarray(a), t), t))
    np.testing.assert_array_equal(out, a)


def test_negacyclic_convolution(rng):
    n = 128
    primes = nt.gen_primes(30, 2, 2 * n)
    t = build_tables(n, primes)
    from hetpu.core.modular import mont_constants, mont_mul, to_mont

    c = mont_constants(primes)
    a = np.stack([rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32) for q in primes])
    b = np.stack([rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32) for q in primes])
    fa = ntt_fwd(jnp.asarray(a), t)
    fb = ntt_fwd(jnp.asarray(b), t)
    prod = mont_mul(to_mont(fa, c), fb, c["q"], c["qinv_neg"])
    got = np.asarray(ntt_inv(prod, t))
    for li, q in enumerate(primes):
        want = _naive_negacyclic_mul(a[li], b[li], q)
        np.testing.assert_array_equal(got[li], want)


def test_output_ordering(rng):
    """Pin the evaluation-order convention: out[i] = a(ψ^{2·br(i)+1}).
    galois.py relies on exactly this exponent map."""
    n = 32
    logn = 5
    (q,) = nt.gen_primes(26, 1, 2 * n)
    t = build_tables(n, (q,))
    a = rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(ntt_fwd(jnp.asarray(a)[None, :], t))[0]
    psi = None
    # recover psi from the table: fwd_w[0, 1] = psi^{br(1)} = psi^{n/2}... use
    # the known generator instead
    psi = nt.root_of_unity(2 * n, q)
    for i in range(n):
        e = 2 * nt.bit_reverse(i, logn) + 1
        want = sum(int(a[j]) * pow(psi, e * j, q) for j in range(n)) % q
        assert int(got[i]) == want, (i, e)
