"""Profile where time goes in multiply_relin_rescale on the real TPU.

Times each sub-op with the honest chained-dependency harness used by
bench.py (xor a data-dependent tag into the input so iterations can't be
overlapped away, close the loop with a device reduction).
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp

from hetpu.utils.keycache import cached_session


def timeit(name, fn, *args, iters=10):
    tag = jnp.uint32(0)
    out, tag = fn(*args, tag)  # compile
    jax.block_until_ready(tag)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, tag = fn(*args, tag)
    _ = int(tag)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.3f} ms/iter")
    return dt


def main():
    sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
    rng = np.random.default_rng(0)
    ev = sess.ev
    BATCH = 32

    base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    a = base.with_(data=jnp.stack([base.data] * BATCH))
    b = b_ct.with_(data=jnp.stack([b_ct.data] * BATCH))
    m3 = ev.multiply(a, b)          # 3-part ct at top level
    lvl = a.level
    L = lvl + 1
    print(f"level={lvl} L={L} N={sess.ctx.params.poly_degree} batch={BATCH}")
    plan = sess.ctx.keyswitch_plan(lvl)
    print("digits J =", plan.num_digits, " key basis R =", plan.q.shape)

    def tagged(f):
        def g(d, tag):
            out = f(d ^ tag)
            t = jnp.sum(out[..., :1, :1, :8] if out.ndim >= 3 else out,
                        dtype=jnp.uint32) & jnp.uint32(1)
            return out, t
        return jax.jit(g)

    # full fused op
    full = tagged(lambda d: ev.multiply_relin_rescale(
        a.with_(data=d), b, sess.rk).data)
    t_full = timeit("multiply_relin_rescale", full, a.data)

    t_mul = timeit("multiply", tagged(
        lambda d: ev.multiply(a.with_(data=d), b).data), a.data)

    t_relin = timeit("relinearize", tagged(
        lambda d: ev.relinearize(m3.with_(data=d), sess.rk).data), m3.data)

    t_resc = timeit("rescale(2part)", tagged(
        lambda d: ev.rescale(a.with_(data=d)).data), a.data)

    # keyswitch internals
    c2 = m3.data[..., 2, :, :]
    t_dec = timeit("  decompose (INTT+FBC+NTT)", tagged(
        lambda d: ev._decompose(d, lvl)), c2)

    ext = ev._decompose(c2, lvl)
    t_ip = timeit("  inner_product (+moddown)", tagged(
        lambda d: jnp.stack(ev._inner_product(d, lvl, sess.rk.key), -3)), ext)

    # raw NTT throughput at the two shapes that matter
    tabs = sess.ctx.tables(lvl)
    from hetpu.core.ntt import ntt_fwd, ntt_inv
    x = a.data[..., 0, :, :]  # [B, L, N]
    t_ntt = timeit(f"  ntt_fwd  [B,{L},N]", tagged(
        lambda d: ntt_fwd(d, tabs)), x)
    t_intt = timeit(f"  ntt_inv  [B,{L},N]", tagged(
        lambda d: ntt_inv(d, tabs, strip_mont=True)), x)

    kb = plan.basis_tables
    R = len(kb.primes)
    y = jnp.tile(x[..., :1, :], (1, plan.num_digits * R // 1, 1))[..., :plan.num_digits * R, :].reshape(BATCH, plan.num_digits, R, sess.ctx.params.poly_degree) % jnp.uint32(kb.primes[0])
    t_nttk = timeit(f"  ntt_fwd key basis [B,{plan.num_digits},{R},N]", tagged(
        lambda d: ntt_fwd(d, kb)), y)

    print("\nbreakdown: mul %.2f relin %.2f rescale %.2f | dec %.2f ip %.2f"
          % (t_mul * 1e3, t_relin * 1e3, t_resc * 1e3, t_dec * 1e3, t_ip * 1e3))


if __name__ == "__main__":
    main()
