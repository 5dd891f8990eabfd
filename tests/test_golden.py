"""Golden-vector exactness suite (VERDICT r2 item 5 — the stand-in for
BASELINE.md's bit-exact SEAL agreement).

Vectors in ``tests/golden/*.npz`` were produced by ``scripts/gen_golden.py``
from an INDEPENDENT exact-bigint model (object-int butterflies, CRT-lift
divide-and-round) that is itself cross-checked against the polynomial-
evaluation definition at generation time.  Every comparison here is exact
u32 equality — any kernel change that flips one bit fails.

``golden_pins.npz`` additionally pins the fused multiply+relin+rescale,
rotation, and BFV CRT multiply outputs under fixed key seeds (kernel
regression pins; their semantic correctness is covered by the scheme/bfv
suites)."""

import pathlib

import numpy as np
import pytest
import jax.numpy as jnp

from hetpu.core.ntt import (
    build_best_tables,
    build_tables,
    ntt_fwd,
    ntt_fwd_mont,
    ntt_inv,
)

GOLD = pathlib.Path(__file__).parent / "golden"


def _z(name):
    return np.load(GOLD / f"{name}.npz")


def _check_ntt_basis(z, tag, tables_builder):
    primes = tuple(int(p) for p in z[f"{tag}_primes"])
    n = z[f"{tag}_x"].shape[-1]
    t = tables_builder(n, primes)
    x = jnp.asarray(z[f"{tag}_x"])
    np.testing.assert_array_equal(np.asarray(ntt_fwd(x, t)), z[f"{tag}_fwd"])
    np.testing.assert_array_equal(np.asarray(ntt_inv(x, t)), z[f"{tag}_inv"])


@pytest.mark.smoke
def test_ntt_golden_tiny_flat():
    _check_ntt_basis(_z("golden_tiny"), "ntt_tiny", build_tables)


@pytest.mark.smoke
def test_ntt_golden_tiny_beststack():
    _check_ntt_basis(_z("golden_tiny"), "ntt_tiny", build_best_tables)


@pytest.mark.full
def test_ntt_golden_bench_n14():
    """The exact basis the headline bench runs on (14 primes, N=2^14)."""
    _check_ntt_basis(_z("golden_n14"), "ntt_n14", build_best_tables)


def _check_rescale(z, tag, preset_name, level):
    from hetpu.core.context import Context
    from hetpu.core.evaluator import _div_round_last
    from hetpu.core.params import preset

    ctx = Context(preset(preset_name))
    primes = tuple(int(p) for p in z[f"{tag}_primes"])
    assert tuple(ctx.params.moduli[: level + 1]) == primes
    plan = ctx.rescale_plan(level)
    x_m = ntt_fwd_mont(jnp.asarray(z[f"{tag}_x"]), ctx.tables(level))
    out_m = _div_round_last(x_m, plan)
    out = ntt_inv(out_m, ctx.tables(level - 1), strip_mont=True)
    np.testing.assert_array_equal(np.asarray(out), z[f"{tag}_out"])


@pytest.mark.smoke
def test_rescale_golden_tiny():
    _check_rescale(_z("golden_tiny"), "rs_tiny", "test_tiny", 2)


@pytest.mark.full
def test_rescale_golden_bench_n14():
    _check_rescale(_z("golden_n14"), "rs_n14", "bench_n14", 8)


@pytest.mark.full
def test_fused_op_pin():
    """multiply+relin+rescale and rotate on the dnum (J=3) config: exact
    output equality under the pinned key seed."""
    from hetpu.session import Session

    z = _z("golden_pins")
    sess = Session.create("test_dnum", seed=b"\x33" * 32, galois_steps=[1])
    proto = sess.encrypt(0.0)
    a = proto.with_(data=jnp.asarray(z["fused_a"]))
    b = proto.with_(data=jnp.asarray(z["fused_b"]))
    out = sess.ev.multiply_relin_rescale(a, b, sess.rk)
    np.testing.assert_array_equal(np.asarray(out.data), z["fused_out"])
    rot = sess.ev.rotate(out, 1, sess.gk)
    np.testing.assert_array_equal(np.asarray(rot.data), z["fused_rot"])


@pytest.mark.full
def test_bfv_multiply_pin():
    """BFV CRT-plain-modulus multiply+relin: exact output equality."""
    from hetpu.bfv import BfvSession

    z = _z("golden_pins")
    bs = BfvSession.create("test_bfv_crt", seed=b"\x34" * 32,
                           galois_steps=[1])
    proto = bs.encrypt(np.zeros(4, dtype=np.int64))
    ca = proto.with_(data=jnp.asarray(z["bfv_a"]))
    cb = proto.with_(data=jnp.asarray(z["bfv_b"]))
    out = bs.multiply_relin(ca, cb)
    np.testing.assert_array_equal(np.asarray(out.data), z["bfv_out"])
