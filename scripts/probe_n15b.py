"""N=2^15 B=1 fused-op cliff, part 2: piecewise timings (probe_n15's
full-op scan hits the remote-compile payload limit, so measure each phase
with a short scan and the full op dispatch-style)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from hetpu.utils.keycache import cached_session

K = 8
REPS = 3
results = {}


def chain(name, f, x0, k=K):
    @jax.jit
    def run(x, tag0):
        def body(tag, _):
            y = f(x ^ tag)
            if isinstance(y, tuple):
                y = y[0]
            tag = jnp.sum(y.reshape(-1)[:8], dtype=jnp.uint32) & jnp.uint32(1)
            return tag, ()
        tag, _ = jax.lax.scan(body, tag0, None, length=k)
        return tag

    t0 = time.perf_counter()
    tag = run(x0, jnp.uint32(0))
    _ = int(tag)
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        tag = run(x0, tag)
        _ = int(tag)
        best = min(best, time.perf_counter() - t0)
    dt = best / k
    print(f"{name:44s} {dt*1e3:9.3f} ms/call   (compile {compile_s:.1f}s)",
          flush=True)
    results[name] = dt * 1e3
    return dt


def direct(name, f, *args, reps=6):
    """Direct dispatch timing (includes ~23 ms relay overhead per call)."""
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:9.3f} ms/dispatch", flush=True)
    results[name + " (dispatch)"] = best * 1e3


def main():
    sess = cached_session("ckks_deep_hi", seed=b"\x77" * 32,
                          galois_steps=[1, 2, 4])
    rng = np.random.default_rng(0)
    ev, ctx = sess.ev, sess.ctx
    lvl = len(ctx.params.moduli) - 1
    tabs = ctx.tables(lvl)
    plan = ctx.keyswitch_plan(lvl)
    print(f"N={ctx.params.poly_degree} L={lvl+1} J={plan.num_digits} "
          f"R={len(plan.basis_tables.primes)}", flush=True)

    base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    q = jnp.asarray(tabs.q)

    # full fused op, direct dispatch (the least-squares shape)
    direct("FULL fused op B=1", lambda: ev.multiply_relin_rescale(
        base, b_ct, sess.rk).data)

    m3 = ev.multiply(base, b_ct)
    c2 = m3.data[..., 2, :, :]
    chain("multiply B=1", lambda d: ev.multiply(
        base.with_(data=d), b_ct).data, base.data)
    chain("decompose B=1", lambda d: ev._decompose(d % q, lvl), c2)
    ext = ev._decompose(c2, lvl)
    qr = jnp.asarray(plan.q)
    chain("inner_product_raw B=1", lambda d: ev._inner_product_raw(
        d % qr, lvl, sess.rk.key), ext)
    accip = ev._inner_product_raw(ext, lvl, sess.rk.key)

    from hetpu.core.ntt import ntt_fwd, ntt_fwd_mont, ntt_inv
    from hetpu.core import rns
    from hetpu.core.modular import mod_add, mod_sub, shoup_mul
    mdr = ctx.moddown_rescale_plan(lvl)
    L = lvl + 1
    g = ctx.params.rescale_group

    def tail(acc):
        acc = acc % qr
        c01 = m3.data[..., :2, :, :]
        w_data = mod_add(
            acc[..., :L, :],
            shoup_mul(c01, mdr.p_mod, mdr.p_mod_shoup, tabs.q), tabs.q)
        src = jnp.concatenate([w_data[..., L - g: L, :], acc[..., L:, :]],
                              axis=-2)
        u = ntt_inv(src, mdr.src_tables, strip_mont=True,
                    extra=mdr.fbc.inv_punit)
        r_q = rns.fbc_apply(u, mdr.fbc, correct=True, premul=False)
        r_m = ntt_fwd_mont(r_q, mdr.dst_tables)
        q_dst = mdr.dst_tables.q
        return shoup_mul(mod_sub(w_data[..., : L - g, :], r_m, q_dst),
                         mdr.pq_inv, mdr.pq_inv_shoup, q_dst)

    chain("moddown+rescale tail B=1", tail, accip)

    # decompose pieces
    chain("  intt 25 planes", lambda d: ntt_inv(
        d % q, tabs, strip_mont=True, extra=plan.dig_inv), c2)
    y0 = ntt_inv(c2, tabs, strip_mont=True, extra=plan.dig_inv)
    qf_cat = jnp.asarray(plan.foreign_cat_tables.q)
    xcat = jnp.concatenate(
        [y0[..., :1, :]] * plan.foreign_cat_tables.q.shape[0], axis=-2)
    chain("  ntt_fwd foreign-cat planes", lambda d: ntt_fwd(
        d % qf_cat, plan.foreign_cat_tables), xcat)

    pathlib.Path("PROBE_N15B.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
