"""Phase-level breakdown of multiply_relin_rescale with scan-chained
honest timing (amortizes the remote backend's per-dispatch overhead the
same way bench.py does).  Each phase is timed as K chained steps inside
one jitted scan; a no-op xor baseline is printed for overhead reference.
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp

from hetpu.utils.keycache import cached_session
from hetpu.core.ntt import ntt_fwd, ntt_fwd_mont, ntt_inv
from hetpu.core import rns
from hetpu.core.modular import mod_add, mod_sub, shoup_mul

K = 16
REPS = 3
B = 32


def chain(name, f, x0):
    """f: u32 array -> u32 array-or-tuple. Times K chained calls; the tag
    xor makes a true dependency chain, output reduced on device."""

    @jax.jit
    def run(x, tag0):
        def body(tag, _):
            y = f(x ^ tag)
            if isinstance(y, tuple):
                y = y[0]
            tag = jnp.sum(y.reshape(-1)[:8], dtype=jnp.uint32) & jnp.uint32(1)
            return tag, ()
        tag, _ = jax.lax.scan(body, tag0, None, length=K)
        return tag

    tag = run(x0, jnp.uint32(0))
    _ = int(tag)
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        tag = run(x0, tag)
        _ = int(tag)
        best = min(best, time.perf_counter() - t0)
    dt = best / K
    print(f"{name:44s} {dt*1e3:8.3f} ms/call  {dt/B*1e6:7.1f} us/op")
    return dt


def main():
    sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
    rng = np.random.default_rng(0)
    ev = sess.ev
    ctx = sess.ctx
    lvl = len(ctx.params.moduli) - 1
    L = lvl + 1
    N = ctx.params.poly_degree
    tabs = ctx.tables(lvl)
    plan = ctx.keyswitch_plan(lvl)
    mdr = ctx.moddown_rescale_plan(lvl)
    J, R = plan.num_digits, len(plan.basis_tables.primes)
    print(f"N={N} L={L} J={J} R={R} B={B} alpha={plan.alpha}")

    base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    a = base.with_(data=jnp.stack([base.data] * B))
    b = b_ct.with_(data=jnp.stack([b_ct.data] * B))
    m3 = ev.multiply(a, b)
    c2 = m3.data[..., 2, :, :]                       # [B, L, N]
    ext = ev._decompose(c2, lvl)                     # [B, J, R, N]
    accip = ev._inner_product_raw(ext, lvl, sess.rk.key)   # [B, 2, R, N]

    q = jnp.asarray(tabs.q)

    chain("FULL multiply_relin_rescale", lambda d: ev.multiply_relin_rescale(
        a.with_(data=d), b, sess.rk).data, a.data)

    chain("multiply (karatsuba)", lambda d: ev.multiply(
        a.with_(data=d), b).data, a.data)

    chain("decompose total", lambda d: ev._decompose(d % q, lvl), c2)

    # decompose sub-pieces
    chain("  intt L planes", lambda d: ntt_inv(
        d % q, tabs, strip_mont=True, extra=plan.dig_inv), c2)

    y0 = ntt_inv(c2, tabs, strip_mont=True, extra=plan.dig_inv)

    def lift_only(y):
        exts = []
        for di, (lo, hi) in enumerate(plan.digit_bounds):
            foreign = plan.foreign_idx[di]
            qf = plan.q[foreign]
            acc = None
            for i in range(lo, hi):
                term = shoup_mul(y[..., i:i + 1, :],
                                 plan.dhat[i][foreign][:, None],
                                 plan.dhat_shoup[i][foreign][:, None], qf)
                acc = term if acc is None else mod_add(acc, term, qf)
            exts.append(acc)
        return jnp.concatenate(exts, axis=-2)

    chain("  fbc lift (shoup loop)", lift_only, y0)

    lifted0 = lift_only(y0)

    def fwd_foreign(lf):
        outs = []
        o = 0
        for di in range(J):
            f = len(plan.foreign_idx[di])
            outs.append(ntt_fwd(lf[..., o:o + f, :] % jnp.asarray(
                plan.q[plan.foreign_idx[di]]), plan.foreign_tables[di]))
            o += f
        return jnp.concatenate(outs, axis=-2)

    chain("  ntt_fwd foreign (19 planes)", fwd_foreign, lifted0)

    chain("inner_product_raw", lambda d: ev._inner_product_raw(
        d % jnp.asarray(plan.q), lvl, sess.rk.key), ext)

    # moddown+rescale tail (from the accumulated ip)
    def tail(acc):
        acc = acc % jnp.asarray(plan.q)
        c01 = m3.data[..., :2, :, :]
        w_data = mod_add(
            acc[..., :L, :],
            shoup_mul(c01, mdr.p_mod, mdr.p_mod_shoup, tabs.q), tabs.q)
        src = jnp.concatenate([w_data[..., L - 1: L, :], acc[..., L:, :]],
                              axis=-2)
        u = ntt_inv(src, mdr.src_tables, strip_mont=True,
                    extra=mdr.fbc.inv_punit)
        r_q = rns.fbc_apply(u, mdr.fbc, correct=True, premul=False)
        r_m = ntt_fwd_mont(r_q, mdr.dst_tables)
        q_dst = mdr.dst_tables.q
        return shoup_mul(mod_sub(w_data[..., : L - 1, :], r_m, q_dst),
                         mdr.pq_inv, mdr.pq_inv_shoup, q_dst)

    chain("moddown+rescale tail", tail, accip)

    # tail sub-pieces
    src0 = jnp.concatenate([accip[..., L - 1: L, :], accip[..., L:, :]],
                           axis=-2)
    chain("  intt src (12 planes)", lambda d: ntt_inv(
        d % jnp.asarray(mdr.src_tables.q), mdr.src_tables, strip_mont=True,
        extra=mdr.fbc.inv_punit), src0)
    u0 = ntt_inv(src0, mdr.src_tables, strip_mont=True,
                 extra=mdr.fbc.inv_punit)
    chain("  fbc moddown (6->8 x2)", lambda d: rns.fbc_apply(
        d % jnp.asarray(mdr.fbc.p), mdr.fbc, correct=True, premul=False), u0)
    rq0 = rns.fbc_apply(u0, mdr.fbc, correct=True, premul=False)
    chain("  ntt_fwd_mont (16 planes)", lambda d: ntt_fwd_mont(
        d % jnp.asarray(mdr.dst_tables.q), mdr.dst_tables), rq0)

    # baselines
    chain("baseline: x % q [B,L,N]", lambda d: d % q, c2)
    chain("baseline: shoup [B,L,N]", lambda d: shoup_mul(
        d % q, tabs.r, tabs.r_shoup, q), c2)


if __name__ == "__main__":
    main()
