"""Bit-exact parity of the MXU (int8-matmul) NTT with the four-step
butterfly kernels — the property every scheme op relies on when the TPU
dispatch swaps kernels (same strategy as tests/test_pallas_ntt.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from hetpu.core import mxu_ntt, ntt4
from hetpu.core import nt
from hetpu.core.ntt import build_tables as build_flat


def _primes(n, k, bits=30):
    return nt.gen_primes(bits, k, 2 * n)


@pytest.fixture(scope="module")
def t4096():
    n = 4096
    return ntt4.build_tables(n, _primes(n, 3))


def _rand(rng, shape, primes):
    q = np.array(primes, dtype=np.uint32).reshape(-1, 1)
    return jnp.asarray(
        rng.integers(0, 2**31, shape, dtype=np.uint32) % q)


def test_fwd_matches_four_step(rng, t4096):
    x = _rand(rng, (2, len(t4096.primes), t4096.n), t4096.primes)
    ref = ntt4.ntt_fwd(x, t4096)
    out = mxu_ntt.ntt_fwd(x, t4096)
    assert (np.asarray(ref) == np.asarray(out)).all()


def test_inv_matches_four_step(rng, t4096):
    x = _rand(rng, (2, len(t4096.primes), t4096.n), t4096.primes)
    ref = ntt4.ntt_inv(x, t4096)
    out = mxu_ntt.ntt_inv(x, t4096)
    assert (np.asarray(ref) == np.asarray(out)).all()


def test_inv_strip_mont(rng, t4096):
    x = _rand(rng, (1, len(t4096.primes), t4096.n), t4096.primes)
    ref = ntt4.ntt_inv(x, t4096, strip_mont=True)
    out = mxu_ntt.ntt_inv(x, t4096, strip_mont=True)
    assert (np.asarray(ref) == np.asarray(out)).all()


def test_fwd_to_mont(rng, t4096):
    from hetpu.core.modular import shoup_mul
    x = _rand(rng, (1, len(t4096.primes), t4096.n), t4096.primes)
    ref = shoup_mul(ntt4.ntt_fwd(x, t4096),
                    jnp.asarray(t4096.r), jnp.asarray(t4096.r_shoup),
                    jnp.asarray(t4096.q))
    out = mxu_ntt.ntt_fwd(x, t4096, to_mont=True)
    assert (np.asarray(ref) == np.asarray(out)).all()


def test_roundtrip_identity(rng, t4096):
    x = _rand(rng, (1, len(t4096.primes), t4096.n), t4096.primes)
    back = mxu_ntt.ntt_inv(mxu_ntt.ntt_fwd(x, t4096), t4096)
    assert (np.asarray(back) == np.asarray(x)).all()


def test_n2_256_shape(rng):
    """N = 2^15 uses n2=256 (rectangular digit matrices)."""
    n = 1 << 15
    t = ntt4.build_tables(n, _primes(n, 2))
    x = _rand(rng, (1, 2, n), t.primes)
    assert (np.asarray(mxu_ntt.ntt_fwd(x, t)) ==
            np.asarray(ntt4.ntt_fwd(x, t))).all()
    assert (np.asarray(mxu_ntt.ntt_inv(x, t)) ==
            np.asarray(ntt4.ntt_inv(x, t))).all()


def test_worst_case_residues(t4096):
    """All residues at q-1 and q/2 edges — digit/accumulator bounds."""
    L = len(t4096.primes)
    q = np.array(t4096.primes, dtype=np.uint32).reshape(-1, 1)
    for val in (q - 1, q // 2, q // 2 + 1):
        x = jnp.asarray(np.broadcast_to(val, (L, t4096.n)).copy())
        assert (np.asarray(mxu_ntt.ntt_fwd(x, t4096)) ==
                np.asarray(ntt4.ntt_fwd(x, t4096))).all()


def test_fwd_lifted_matches_explicit_decompose(rng):
    """Fused lift+NTT (ntt_fwd_lifted) is bit-exact against the explicit
    shoup-loop lift followed by ntt_fwd — the key-switch decompose
    equivalence the evaluator's fused branch relies on."""
    from hetpu.core.context import Context
    from hetpu.core.modular import mod_add, shoup_mul
    from hetpu.core.ntt import ntt_fwd

    from hetpu.core.params import ckks_params
    # N >= 4096 so the key basis gets four-step (MXU-shaped) tables
    ctx = Context(ckks_params(1 << 12, levels=5, scale_bits=30,
                              num_special=2, first_prime_bits=31,
                              special_prime_bits=31, sec_level=0))
    lvl = ctx.num_data - 1
    plan = ctx.keyswitch_plan(lvl)
    n = ctx.params.poly_degree
    q_act = np.array(ctx.params.moduli[: lvl + 1],
                     dtype=np.uint32).reshape(-1, 1)
    y = jnp.asarray(rng.integers(0, 2**31, (2, lvl + 1, n),
                                 dtype=np.uint32) % q_act)

    # explicit loop (the evaluator's fallback branch)
    accs = []
    for di, (lo, hi) in enumerate(plan.digit_bounds):
        foreign = plan.foreign_idx[di]
        qf = plan.q[foreign]
        acc = None
        for i in range(lo, hi):
            term = shoup_mul(y[..., i: i + 1, :],
                             plan.dhat[i][foreign][:, None],
                             plan.dhat_shoup[i][foreign][:, None], qf)
            acc = term if acc is None else mod_add(acc, term, qf)
        accs.append(acc)
    want = ntt_fwd(jnp.concatenate(accs, axis=-2), plan.foreign_cat_tables)

    got = mxu_ntt.ntt_fwd_lifted(y, plan.lift_w, plan.lift_ws,
                                 plan.lift_dig, plan.foreign_cat_tables)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_shoup_fast_exact(rng):
    """The 3-multiply approximate-mulhi Shoup (_shoup_fast) is exact for
    q < 2^30 for ANY u32 input x (incl. the REDC output range ≥ 2^31)
    — the property the bench_n14_fast kernels rely on."""
    for qbits in (28, 29, 30):
        q = int(nt.gen_primes(qbits, 1, 2048)[0])
        assert q < (1 << 30)
        w = rng.integers(0, q, 256, dtype=np.uint64)
        ws = ((w << 32) // q).astype(np.uint32)
        x = np.concatenate([
            rng.integers(0, 1 << 32, 192, dtype=np.uint64),
            np.array([0, 1, q - 1, q, 2 * q, (1 << 32) - 1], np.uint64),
            rng.integers((1 << 31), 1 << 32, 58, dtype=np.uint64)])
        want = (x * w) % q
        got = np.asarray(mxu_ntt._shoup_fast(
            jnp.asarray(x.astype(np.uint32)), jnp.asarray(w.astype(np.uint32)),
            jnp.asarray(ws), jnp.uint32(q))).astype(np.uint64)
        assert (got == want).all()
