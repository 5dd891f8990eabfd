"""Headline benchmark: CKKS ct·ct multiply + relinearize + rescale
throughput at N=2^14 (the BASELINE.md north-star metric; reference
machinery: ``math_operations.cpp:338-354`` ct-ct mult + relin timers).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ops/s", "vs_baseline": N}
vs_baseline is against the 10k ops/s/chip target (the reference publishes
no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hetpu.utils.keycache import cached_session

    sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
    rng = np.random.default_rng(0)

    BATCH = 8          # amortize dispatch; ops counted per ciphertext pair
    cts = [sess.encrypt(rng.uniform(-1, 1, sess.slots)) for _ in range(2)]
    a = cts[0].with_(data=jnp.stack([cts[0].data] * BATCH))
    b = cts[1].with_(data=jnp.stack([cts[1].data] * BATCH))

    @jax.jit
    def step(da, db):
        out = sess.ev.multiply_relin_rescale(
            a.with_(data=da), b.with_(data=db), sess.rk)
        return out.data

    # compile + warmup
    out = step(a.data, b.data)
    out.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(a.data, b.data)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    ops_per_s = BATCH * iters / dt
    print(json.dumps({
        "metric": "ckks_mult_relin_rescale_n14_ops_per_s",
        "value": round(ops_per_s, 2),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / 10_000.0, 4),
    }))


if __name__ == "__main__":
    main()
