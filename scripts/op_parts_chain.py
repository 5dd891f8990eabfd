"""Scan-chained per-part profile of multiply_relin_rescale on the TPU,
plus batch-size sensitivity of the full op."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from hetpu.utils.keycache import cached_session

K = 16
REPS = 3


def chain(name, f, x0, per_call=1):
    @jax.jit
    def run(x, tag0):
        def body(tag, _):
            y = f(jnp.bitwise_xor(x, tag))
            tag = jnp.sum(y[..., :1, :8], dtype=jnp.uint32) & jnp.uint32(1)
            return tag, ()
        tag, _ = jax.lax.scan(body, tag0, None, length=K)
        return tag

    tag = run(x0, jnp.uint32(0))
    _ = int(tag)
    t0 = time.perf_counter()
    for _ in range(REPS):
        tag = run(x0, tag)
    _ = int(tag)
    dt = (time.perf_counter() - t0) / (REPS * K)
    print(f"{name:38s} {dt*1e3:8.3f} ms/step  {dt/per_call*1e6:8.2f} us/op")
    return dt


def main():
    sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
    ev = sess.ev
    rng = np.random.default_rng(0)

    for B in (32, 64):
        base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
        bct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
        a = base.with_(data=jnp.stack([base.data] * B))
        b = bct.with_(data=jnp.stack([bct.data] * B))
        m3 = ev.multiply(a, b)
        lvl = a.level
        print(f"--- BATCH={B}")
        chain("full multiply_relin_rescale", lambda d: ev.
              multiply_relin_rescale(a.with_(data=d), b, sess.rk).data,
              a.data, B)
        if B == 32:
            chain("multiply only", lambda d: ev.multiply(
                a.with_(data=d), b).data, a.data, B)
            c2 = m3.data[..., 2, :, :]
            chain("decompose", lambda d: ev._decompose(d[..., 0, :, :], lvl),
                  m3.data, B)
            ext = ev._decompose(c2, lvl)
            chain("inner_product_raw", lambda d: ev._inner_product_raw(
                d, lvl, sess.rk.key), ext, B)
            acc = ev._inner_product_raw(ext, lvl, sess.rk.key)
            plan = sess.ctx.moddown_rescale_plan(lvl)

            def fused_tail(d):
                return ev._relin_rescale_fused(m3.with_(data=d), sess.rk).data
            chain("relin+rescale fused (from 3part)", fused_tail, m3.data, B)


if __name__ == "__main__":
    main()
