"""Sweep (BATCH, K) for the headline fused op in ONE process/session —
separates per-dispatch RPC overhead from true per-step device time."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax
import jax.numpy as jnp
from hetpu.utils.keycache import cached_session


def main():
    sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
    rng = np.random.default_rng(0)
    base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))

    for BATCH in (32, 64):
        a = base.with_(data=jnp.stack([base.data] * BATCH))
        b = b_ct.with_(data=jnp.stack([b_ct.data] * BATCH))
        for K in (8, 32, 96):
            @jax.jit
            def run(da, db, tag0):
                def body(tag, _):
                    ca = a.with_(data=jnp.bitwise_xor(da, tag))
                    out = sess.ev.multiply_relin_rescale(
                        ca, b.with_(data=db), sess.rk)
                    new_tag = jnp.sum(out.data[..., :1, :1, :8],
                                      dtype=jnp.uint32) & jnp.uint32(1)
                    return new_tag, ()
                tag, _ = jax.lax.scan(body, tag0, None, length=K)
                return tag

            _ = int(run(a.data, b.data, jnp.uint32(0)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                t = run(a.data, b.data, jnp.uint32(0))
                _ = int(t)
                best = min(best, time.perf_counter() - t0)
            print(f"B={BATCH:3d} K={K:3d} call={best*1e3:8.1f} ms "
                  f"per-step={best/K*1e3:7.2f} ms "
                  f"ops/s={BATCH*K/best:8.0f}", flush=True)


if __name__ == "__main__":
    main()
