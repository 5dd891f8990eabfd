"""Scan-chained kernel micro-profiler: accurate per-plane NTT/elementwise
costs on the real TPU (the per-dispatch overhead of the remote backend is
amortized over K chained steps inside one jitted scan, same honest-timing
scheme as bench.py)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from hetpu.utils.keycache import cached_session
from hetpu.core.ntt import ntt_fwd, ntt_fwd_mont, ntt_inv
from hetpu.core.modular import mont_mul, mod_add, shoup_mul

K = 20
REPS = 3


def chain(name, f, x0, planes):
    """f: u32 array -> u32 array (same shape). Times K chained calls."""

    @jax.jit
    def run(x, tag0):
        def body(carry, _):
            x, tag = carry
            y = f(x ^ tag)
            tag = jnp.sum(y[..., :1, :8], dtype=jnp.uint32) & jnp.uint32(1)
            return (x, tag), ()
        (x, tag), _ = jax.lax.scan(body, (x, tag0), None, length=K)
        return tag

    tag = run(x0, jnp.uint32(0))
    _ = int(tag)
    t0 = time.perf_counter()
    for _ in range(REPS):
        tag = run(x0, tag)
    _ = int(tag)
    dt = (time.perf_counter() - t0) / (REPS * K)
    print(f"{name:40s} {dt*1e3:8.3f} ms/call  {dt/planes*1e6:7.2f} us/plane"
          f"  ({planes} planes)")
    return dt


def main():
    sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
    rng = np.random.default_rng(0)
    B = 32
    lvl = len(sess.ctx.params.moduli) - 1
    tabs = sess.ctx.tables(lvl)
    L = lvl + 1
    N = sess.ctx.params.poly_degree
    q = jnp.asarray(tabs.q)
    mc = sess.ctx.mont(lvl)
    qm, qn = mc["q"], mc["qinv_neg"]

    x = jnp.asarray(
        rng.integers(0, sess.ctx.params.moduli[0], (B, L, N), dtype=np.uint32))

    chain(f"ntt_fwd [B,{L},N]", lambda d: ntt_fwd(d % q, tabs), x, B * L)
    chain(f"ntt_fwd_mont [B,{L},N]",
          lambda d: ntt_fwd_mont(d % q, tabs), x, B * L)
    chain(f"ntt_inv [B,{L},N]",
          lambda d: ntt_inv(d % q, tabs), x, B * L)
    chain(f"ntt_inv strip [B,{L},N]",
          lambda d: ntt_inv(d % q, tabs, strip_mont=True), x, B * L)

    # elementwise mont_mul at inner-product shape [B, 2, 12, N] x J=3
    plan = sess.ctx.keyswitch_plan(lvl)
    R = len(plan.basis_tables.primes)
    J = plan.num_digits
    y = jnp.asarray(rng.integers(0, sess.ctx.params.moduli[0],
                                 (B, J, R, N), dtype=np.uint32))
    kq = jnp.asarray(plan.q)

    def ip(d):
        d = d % kq
        acc = None
        for j in range(J):
            prod = mont_mul(d[:, j, None], d[:, (j + 1) % J, None],
                            plan.q, plan.qinv_neg)
            acc = prod if acc is None else mod_add(acc, prod, plan.q)
        return acc[:, 0]

    chain(f"inner-product-ish [B,{J}x2x{R},N]", ip, y, B * J * 2 * R)

    def sh(d):
        return shoup_mul(d % q, tabs.r, tabs.r_shoup, q)

    chain(f"shoup_mul [B,{L},N]", sh, x, B * L)

    def mm(d):
        d = d % q
        return mont_mul(d, d, qm, qn)

    chain(f"mont_mul [B,{L},N]", mm, x, B * L)


if __name__ == "__main__":
    main()
