"""Headline benchmark: CKKS ct·ct multiply + relinearize + rescale
throughput at N=2^14 (the BASELINE.md north-star metric; reference
machinery: ``math_operations.cpp:338-354`` ct-ct mult + relin timers).

Honest timing on remote-device backends: every iteration's input is
derived from the previous output (no dead computations, no memoizable
repeats), and the loop is closed with a device-side reduction fetched to
the host — wall-clock covers real execution, not dispatch.

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

    BATCH = 32         # ops counted per ciphertext pair
    base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    a = base.with_(data=jnp.stack([base.data] * BATCH))
    b = b_ct.with_(data=jnp.stack([b_ct.data] * BATCH))

    @jax.jit
    def step(da, db, tag):
        # fold the previous iteration's tag into the input: forces a true
        # sequential dependency chain across iterations
        ca = a.with_(data=jnp.bitwise_xor(da, tag))
        out = sess.ev.multiply_relin_rescale(ca, b.with_(data=db), sess.rk)
        new_tag = jnp.sum(out.data[..., :1, :1, :8],
                          dtype=jnp.uint32) & jnp.uint32(1)
        return out.data, new_tag

    # compile + warmup, and measure fetch latency
    _, tag = step(a.data, b.data, jnp.uint32(0))
    t0 = time.perf_counter()
    _ = int(tag)
    lat = time.perf_counter() - t0

    iters = 20
    tag = jnp.uint32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, tag = step(a.data, b.data, tag)
    _ = int(tag)                       # forces the whole chain
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
