"""Diagnose the N=2^15 single-ct (B=1) fused-op cliff (VERDICT r4 #1).

Round-4 probe saw warm mult_relin_rescale at B=1/N=2^15 take ~270 ms
where plane math predicts ~3 ms.  This script measures, scan-chained
(same honest-timing shape as bench.py):
  - fused op at B=1 / B=4 / B=8
  - bare ntt_fwd at rows=2 (one ct's parts) vs rows=16
  - decompose / inner_product / moddown tail at B=1
to localize the cliff.
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from hetpu.utils.keycache import cached_session

K = 32
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


def main():
    sess = cached_session("ckks_deep_hi", seed=b"\x77" * 32,
                          galois_steps=[1, 2, 4])
    rng = np.random.default_rng(0)
    ev, ctx = sess.ev, sess.ctx
    lvl = len(ctx.params.moduli) - 1
    L = lvl + 1
    N = ctx.params.poly_degree
    tabs = ctx.tables(lvl)
    plan = ctx.keyswitch_plan(lvl)
    print(f"N={N} L={L} J={plan.num_digits} R={len(plan.basis_tables.primes)}",
          flush=True)

    base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    q = jnp.asarray(tabs.q)

    # bare NTT at the two row shapes
    x2 = base.data % q                       # [2, L, N]  rows=2
    x16 = jnp.stack([x2] * 8)                # [8, 2, L, N] rows=16
    from hetpu.core.ntt import ntt_fwd
    chain("ntt_fwd rows=2  [2,L,N]", lambda d: ntt_fwd(d % q, tabs), x2)
    chain("ntt_fwd rows=16 [8,2,L,N]", lambda d: ntt_fwd(d % q, tabs), x16)

    # fused op at each batch
    for B in (1, 4, 8):
        if B == 1:
            a, b = base, b_ct
        else:
            a = base.with_(data=jnp.stack([base.data] * B))
            b = b_ct.with_(data=jnp.stack([b_ct.data] * B))
        dt = chain(f"fused mult_relin_rescale B={B}",
                   lambda d, a=a, b=b: ev.multiply_relin_rescale(
                       a.with_(data=d), b, sess.rk).data, a.data,
                   k=8 if B == 1 else K)
        print(f"   -> {dt/B*1e3:.2f} ms/op", flush=True)

    # pieces at B=1
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
    from hetpu.core.evaluator import _mod_down
    md = ctx.moddown_rescale_plan(lvl)
    chain("relin+rescale tail B=1", lambda d: ev._relin_rescale_fused(
        m3.with_(data=jnp.stack([m3.data[..., p, :, :] for p in range(3)],
                                axis=-3) ^ (d[..., :1, :, :] * 0)),
        sess.rk).data, m3.data)

    pathlib.Path("PROBE_N15.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
