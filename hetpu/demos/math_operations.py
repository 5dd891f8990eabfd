"""Primitive-op latency sweep (reference ``src/demos/math_operations.cpp``):
times pt-ct add, ct-ct add, pt-ct mult, ct-ct mult, relinearization as a
function of modulus-chain depth — the reference sweeps chain_levels 2..26
at N=2^15 with 26 HAND-WRITTEN modulus ladders (:21-247, :614-619); here
one generator parameterizes the chain (SURVEY.md §2c asks for this)."""

from __future__ import annotations

import numpy as np

from ..core.params import chain_sweep
from ..session import Session
from ..utils import Timer


def bench_he_all(sess: Session, reps: int = 5) -> dict:
    import jax
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, sess.slots)
    y = rng.uniform(-1, 1, sess.slots)
    ct1, ct2 = sess.encrypt(x), sess.encrypt(y)
    pt = sess.encode(y)
    ev = sess.ev
    out = {}

    cases = {
        "pt_ct_add": lambda: ev.add_plain(ct1, pt),
        "ct_ct_add": lambda: ev.add(ct1, ct2),
        "pt_ct_mult": lambda: ev.multiply_plain(ct1, pt),
        "ct_ct_mult": lambda: ev.multiply(ct1, ct2),
        "relin": lambda: ev.relinearize(ev.multiply(ct1, ct2), sess.rk),
        "rescale": lambda: ev.rescale(ev.multiply_plain(ct1, pt)),
    }
    for name, fn in cases.items():
        jax.block_until_ready(fn().data)     # compile
        t = Timer()
        for _ in range(reps):
            r = fn()
        t_s = t.tocr(block_on=r.data) / reps
        out[name] = t_s
    return out


def bench_he_all_chained(sess: Session, K: int = 64, reps: int = 2) -> dict:
    """Scan-chained per-op DEVICE latencies: each case runs K times inside
    one jitted ``lax.scan`` with a data-dependent tag chain (bench.py's
    honest-timing shape), so per-dispatch transport overhead is amortized
    away and the level-scaling curve is device-true (VERDICT r4 #4;
    reference sweep ``math_operations.cpp:614-619``)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, sess.slots)
    y = rng.uniform(-1, 1, sess.slots)
    ct1, ct2 = sess.encrypt(x), sess.encrypt(y)
    pt = sess.encode(y)
    ev = sess.ev
    m3 = ev.multiply(ct1, ct2)
    pm = ev.multiply_plain(ct1, pt)

    cases = {
        "pt_ct_add": (lambda d: ev.add_plain(ct1.with_(data=d), pt).data,
                      ct1.data),
        "ct_ct_add": (lambda d: ev.add(ct1.with_(data=d), ct2).data,
                      ct1.data),
        "pt_ct_mult": (lambda d: ev.multiply_plain(ct1.with_(data=d),
                                                   pt).data, ct1.data),
        "ct_ct_mult": (lambda d: ev.multiply(ct1.with_(data=d), ct2).data,
                       ct1.data),
        "relin": (lambda d: ev.relinearize(m3.with_(data=d), sess.rk).data,
                  m3.data),
        "rescale": (lambda d: ev.rescale(pm.with_(data=d)).data, pm.data),
    }
    def fold_into(x0, y):
        """XOR-fold EVERY element of y into an x0-shaped tag: the next
        step consumes all of this step's output, so XLA cannot slice the
        purely-elementwise ops down to a sampled tag."""
        n0 = x0.size
        yf = jnp.ravel(y)
        k = -(-yf.size // n0)
        yf = jnp.pad(yf, (0, k * n0 - yf.size))
        folded = jax.lax.reduce(yf.reshape(k, n0), jnp.uint32(0),
                                jnp.bitwise_xor, (0,))
        return (folded & jnp.uint32(1)).reshape(x0.shape)

    out = {}
    for name, (fn, x0) in cases.items():
        @jax.jit
        def run(x0, tag0, fn=fn):
            def body(tag, _):
                yv = fn(jnp.bitwise_xor(x0, tag))
                return fold_into(x0, yv), ()
            tag, _ = jax.lax.scan(body, tag0, None, length=K)
            return jnp.sum(tag, dtype=jnp.uint32)
        tag0 = jnp.zeros_like(x0)
        tag = run(x0, tag0)
        _ = int(tag)                                     # compile + warm
        t = Timer()
        for _ in range(reps):
            tag = run(x0, tag0)
        _ = int(tag)
        out[name] = t.tocr() / (K * reps)
    return out


def demo_bench_all(small=False):
    n = 1 << (13 if small else 15)
    max_levels = 6 if small else 26
    print(f"chain-level sweep at N={n} (reference :614-619)")
    for lv, params in chain_sweep(n, 2, max_levels,
                                  sec_level=0 if small else 128):
        sess = Session.create(params, galois_steps=[1])
        times = bench_he_all(sess)
        row = " ".join(f"{k}={v*1e3:.3f}ms" for k, v in times.items())
        print(f"levels={lv:2d}  {row}")


def demo_bench_rot(small=False):
    """Rotation smoke test (reference bench_he_rot :512-593)."""
    import jax
    sess = Session.create("test_deep" if small else "ckks_deep",
                          galois_steps=[1, 2, 4])
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, sess.slots)
    ct = sess.encrypt(x)
    jax.block_until_ready(sess.ev.rotate(ct, 1, sess.gk).data)
    t = Timer()
    out = sess.ev.rotate(ct, 1, sess.gk)
    t.toc("HE rotate(1) time", block_on=out.data)
    got = sess.decrypt(out).real[:4]
    print("rot =", got, "\nexpected =", np.roll(x, -1)[:4])


DEMOS = {"bench_all": demo_bench_all, "bench_rot": demo_bench_rot}
