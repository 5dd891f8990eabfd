"""Multi-chip sharding on the 8-device virtual CPU mesh (SURVEY.md §4:
same collective program on an emulated mesh before a real pod slice)."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hetpu import parallel
from hetpu.session import Session
from hetpu.utils.keycache import cached_session

SEED = b"\x09" * 32


@pytest.fixture(scope="module")
def sess():
    return cached_session("test_tiny", seed=SEED,
                          galois_steps=list(range(8)))


def test_shard_batch_dp(sess, rng):
    """Data-parallel batch axis: sharded elementwise pipeline."""
    mesh = parallel.make_mesh((8,), ("dp",))
    B = 16
    xs = [rng.uniform(-1, 1, sess.slots) for _ in range(B)]
    cts = [sess.encrypt(x) for x in xs]
    batched = cts[0].with_(data=jnp.stack([c.data for c in cts]))
    sharded = parallel.shard_batch(batched, mesh, "dp")
    out = sess.ev.square_relin_rescale(sharded, sess.rk)
    for i in (0, 7, 15):
        got = sess.decrypt(out.with_(data=np.asarray(out.data)[i]))
        np.testing.assert_allclose(got.real, xs[i] ** 2, atol=1e-3)


def test_mod_all_reduce(sess, rng):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = parallel.make_mesh((8,), ("r",))
    q = np.uint32(97)
    x = rng.integers(0, 97, size=(8, 4, 128), dtype=np.int64).astype(np.uint32)

    def fn(xs):
        return parallel.mod_all_reduce(xs[0], q, "r")

    out = shard_map(fn, mesh=mesh, in_specs=(P("r"),), out_specs=P(),
                    check_vma=False)(jnp.asarray(x))
    want = x.astype(np.uint64).sum(axis=0) % 97
    np.testing.assert_array_equal(np.asarray(out), want.astype(np.uint32))


def test_bucketed_matvec(sess, rng):
    """Rotation/key-parallel diagonal matvec with psum-style modular
    reduction — the north-star distributed hot loop."""
    mesh = parallel.make_mesh((4,), ("rot",))
    d = 8
    A = rng.uniform(-1, 1, (d, d))
    v = rng.uniform(-1, 1, d)
    # diag-layout rows, tiled ×2 for rotation wrap
    diag_rows = []
    for j in range(d):
        row = np.array([A[i, (i + j) % d] for i in range(d)])
        diag_rows.append(sess.encrypt(np.tile(row, 2)).data)
    diags = sess.encrypt(np.zeros(d)).with_(data=jnp.stack(diag_rows))
    vec = sess.encrypt(np.tile(v, 2))
    out = parallel.bucketed_matvec(sess, diags, vec, d, mesh, "rot")
    got = sess.decrypt(out).real[:d]
    np.testing.assert_allclose(got, A @ v, atol=1e-2)


def test_tp_relinearize_bit_exact(rng):
    """Limb-axis sharded keyswitch (parallel.tp): bit-identical to the
    single-device Evaluator.relinearize, on tp=2 and tp=4 meshes."""
    import jax
    from jax.sharding import Mesh
    from hetpu.parallel import tp as tpmod
    from hetpu.session import Session

    sess = Session.create("test_dnum", seed=b"\x41" * 32, galois_steps=[1])
    x = rng.uniform(-1, 1, sess.slots)
    y = rng.uniform(-1, 1, sess.slots)
    c3 = sess.ev.multiply(sess.encrypt(x), sess.encrypt(y))
    want = sess.ev.relinearize(c3, sess.rk)
    for ntp in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:ntp]), axis_names=("tp",))
        got = tpmod.tp_relinearize(sess, c3, mesh, axis="tp")
        np.testing.assert_array_equal(np.asarray(got.data),
                                      np.asarray(want.data))
        # semantic check too: decrypts to x*y
        np.testing.assert_allclose(
            sess.decrypt(got.with_(data=jax.device_get(got.data))).real,
            (x * y), atol=5e-3)


def test_tp_relinearize_uses_collectives(rng):
    """The sharded keyswitch must lower to explicit ppermute collectives
    (the mod_all_reduce butterfly) — not an all-gather of everything."""
    import jax
    from jax.sharding import Mesh
    from hetpu.parallel import tp as tpmod
    from hetpu.session import Session

    sess = Session.create("test_dnum", seed=b"\x42" * 32, galois_steps=[1])
    x = rng.uniform(-1, 1, sess.slots)
    c3 = sess.ev.multiply(sess.encrypt(x), sess.encrypt(x))
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("tp",))
    plan = tpmod.build_tp_plan(sess.ctx, c3.level, 4)
    # lower the exact shard_map computation and inspect the stable HLO
    import jax.numpy as jnp
    traced = jax.jit(lambda d: tpmod.tp_relinearize(
        sess, c3.with_(data=d), mesh, axis="tp").data)
    txt = traced.lower(c3.data).as_text()
    n_perm = len(re.findall(r"collective[-_]permute", txt))
    assert n_perm >= 2, f"expected butterfly ppermutes, found {n_perm}"
    assert not re.search(r"all[-_]gather", txt)


def test_cp_ntt_bit_exact_roundtrip(rng):
    """Coefficient-axis sharded four-step NTT (parallel.cp): one
    all_to_all per transform, bit-identical to the single-device kernel,
    and inv∘fwd restores the input layout."""
    from jax.sharding import Mesh
    from hetpu.core import ntt4
    from hetpu.core.ntt import ntt_fwd, ntt_inv
    from hetpu.parallel import cp as cpmod
    from hetpu.core import nt

    n = 2048
    primes = nt.gen_primes(24, 2, 2 * n)[:2]
    t = ntt4.build_tables(n, primes)
    x = jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint32)
                              for q in primes]))
    want = np.asarray(ntt_fwd(x, t))
    for ncp in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:ncp]), axis_names=("cp",))
        got = cpmod.cp_ntt_fwd(x, t, mesh)
        np.testing.assert_array_equal(np.asarray(jax.device_get(got)), want)
        # inverse matches the single-device inverse on the same input …
        back = cpmod.cp_ntt_inv(jnp.asarray(want), t, mesh)
        np.testing.assert_array_equal(np.asarray(jax.device_get(back)),
                                      np.asarray(ntt_inv(jnp.asarray(want),
                                                         t)))
        # … and inv∘fwd is the identity
        np.testing.assert_array_equal(np.asarray(jax.device_get(back)),
                                      np.asarray(x))
    # the lowering must contain the explicit all_to_all exchange
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("cp",))
    txt = jax.jit(lambda a: cpmod.cp_ntt_fwd(a, t, mesh)).lower(x).as_text()
    assert re.search(r"all[-_]to[-_]all", txt), "no all_to_all in lowering"


def test_tp_apply_galois_bit_exact(rng):
    """tp rotation keyswitch (parallel.tp.tp_apply_galois / tp_rotate):
    bit-identical to Evaluator.apply_galois, and the cached kernel/key
    slices are reused across calls (no per-call rebuild)."""
    import jax
    from jax.sharding import Mesh
    from hetpu.core import galois
    from hetpu.parallel import tp as tpmod
    from hetpu.session import Session

    sess = Session.create("test_dnum", seed=b"\x43" * 32, galois_steps=[1, 2])
    x = rng.uniform(-1, 1, sess.slots)
    ct = sess.encrypt(x)
    n = sess.ctx.params.poly_degree
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("tp",))
    for steps in (1, 2):
        elt = galois.rotation_elt(n, steps)
        want = sess.ev.apply_galois(ct, elt, sess.gk)
        got = tpmod.tp_rotate(sess, ct, steps, mesh)
        np.testing.assert_array_equal(np.asarray(got.data),
                                      np.asarray(want.data))
        np.testing.assert_allclose(
            sess.decrypt(got.with_(data=jax.device_get(got.data))).real,
            np.roll(x, -steps), atol=5e-3)
    # caching: plan + kernel + per-key slices built exactly once per config
    assert len(sess.ctx._tp_plans) == 1
    assert len(sess.ctx._tp_kernels) == 1
    # one cached slice set per galois key used (+ none rebuilt on repeat)
    n_keys = len(sess.ctx._tp_keys)
    tpmod.tp_rotate(sess, ct, 1, mesh)
    assert len(sess.ctx._tp_keys) == n_keys


def test_matmul_routes_through_mesh(sess, rng, monkeypatch):
    """BatchedMatrix diag-matvec routes through bucketed_matvec when the
    session has an active mesh (sess.use_mesh), matching the local path."""
    from hetpu.linalg import BatchedMatrix
    d = 8
    A = rng.uniform(-1, 1, (d, d))
    v = rng.uniform(-1, 1, (d, 1))
    ma = BatchedMatrix.encrypt(sess, A, layout="diag")
    mv = BatchedMatrix.encrypt(sess, v, layout="col")
    local = ma.matmul(mv).decrypt().real
    mesh = parallel.make_mesh((4,), ("rot",))
    calls = []
    orig = parallel.bucketed_matvec

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    try:
        sess.use_mesh(mesh, "rot")
        monkeypatch.setattr(parallel, "bucketed_matvec", spy)
        routed = ma.matmul(mv)
    finally:
        sess.use_mesh(None)
    # the mesh path must actually have been taken — otherwise the
    # comparison below is the local path against itself (ADVICE r4)
    assert calls, "matmul did not route through bucketed_matvec"
    got = routed.decrypt().real
    np.testing.assert_allclose(got, A @ v, atol=1e-2)
    # the bucketed kernel accumulates in a different order than the local
    # hoisted loop — same ciphertext-level result up to rounding noise
    np.testing.assert_allclose(got, local, atol=1e-4)
