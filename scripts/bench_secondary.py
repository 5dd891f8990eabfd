"""Secondary benchmark metrics (BASELINE.md: "enc matvec/s, NTT
limb-ops/s") — same honest scan-chained harness as bench.py.

Prints one JSON line per metric:
  rotation ops/s           (Galois keyswitch — the diag-matmul hot loop)
  NTT limb-plane transforms/s at N=2^14 (fwd, Montgomery epilogue)
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from hetpu.utils.keycache import cached_session


def chain(fn, x0, K, reps=2):
    @jax.jit
    def run(x, tag0):
        def body(tag, _):
            y = fn(jnp.bitwise_xor(x, tag))
            tag = jnp.sum(y.reshape(-1)[:8], dtype=jnp.uint32) & jnp.uint32(1)
            return tag, ()
        tag, _ = jax.lax.scan(body, tag0, None, length=K)
        return tag

    _ = int(run(x0, jnp.uint32(0)))
    t0 = time.perf_counter()
    tag = jnp.uint32(0)
    for _ in range(reps):
        tag = run(x0, tag)
    _ = int(tag)
    return (time.perf_counter() - t0) / (K * reps)


def main():
    B, K = 8, 256
    # FULL ±2^i rotation keyset: keygen is seconds since the compile-cache
    # fix (keys passed as jit arguments, not baked-in constants)
    sess = cached_session("bench_n14", seed=b"\x22" * 32)
    rng = np.random.default_rng(0)
    ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    a = ct.with_(data=jnp.stack([ct.data] * B))

    dt = chain(lambda d: sess.ev.rotate(a.with_(data=d), 1, sess.gk).data,
               a.data, K)
    print(json.dumps({"metric": "ckks_rotate_n14_ops_per_s",
                      "value": round(B / dt, 2), "unit": "ops/s"}))

    # hoisted 8-step bundle: one shared digit decomposition, 8 key inner
    # products — the design win over per-rotation keyswitch
    # (reference he_linalg.cpp:977-1003)
    steps = [1, 2, 4, 8, 16, 32, 64, 128]   # in the ±2^i keyset

    def hoist(d):
        outs = sess.ev.rotate_hoisted(a.with_(data=d), steps, sess.gk)
        return outs[-1].data
    dt = chain(hoist, a.data, 64)
    print(json.dumps({"metric": "ckks_rotate_hoisted8_n14_ops_per_s",
                      "value": round(B * len(steps) / dt, 2),
                      "unit": "ops/s"}))

    from hetpu.core.ntt import ntt_fwd_mont
    tabs = sess.ctx.tables_full
    L = len(tabs.primes)
    x = jnp.stack([jnp.asarray(
        rng.integers(0, tabs.primes[i], sess.ctx.params.poly_degree,
                     dtype=np.uint32)) for i in range(L)])
    xb = jnp.stack([x] * B)
    q = jnp.asarray(tabs.q)
    dt = chain(lambda d: ntt_fwd_mont(d % q, tabs), xb, K)
    print(json.dumps({"metric": "ntt_fwd_n14_limb_planes_per_s",
                      "value": round(B * L / dt, 1), "unit": "planes/s"}))


if __name__ == "__main__":
    main()
