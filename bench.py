"""Headline benchmark: CKKS ct·ct multiply + relinearize + rescale
throughput at N=2^14 (the BASELINE.md north-star metric; reference
machinery: ``math_operations.cpp:338-354`` ct-ct mult + relin timers).

Honest timing on remote-device backends: iterations form a true
sequential dependency chain (each step's input folds in a data-dependent
tag from the previous output, inside a jitted ``lax.scan``), and the loop
is closed with a device-side reduction fetched to the host — wall-clock
covers real execution, not dispatch, and nothing is memoizable or
dead-code-eliminable.  The scan keeps host dispatch out of the measured
region (the axon remote backend costs ~10 ms per dispatched executable,
which is not a property of the framework under test).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ops/s", "vs_baseline": N}
vs_baseline is against the 10k ops/s/chip target (the reference publishes
no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hetpu.utils.keycache import cached_session

    # preset variants (same metric — N=2^14 mult+relin+rescale):
    #   bench_n14      α=5, 30/31-bit primes (default)
    #   bench_n14_a4   α=4 — fewer key-switch planes
    #   bench_n14_fast α=4 + all primes < 2^30 → approx-mulhi kernels
    preset = os.environ.get("HETPU_BENCH_PRESET", "bench_n14")
    sess = cached_session(preset, seed=b"\x21" * 32, galois_steps=[1])
    rng = np.random.default_rng(0)

    # swept on v5e (round 3): B=8 → 10.7k, B=16 → 10.5k, B=24 → 10.3k,
    # B=32 → 9.6k ops/s — small batches keep the per-step working set
    # VMEM-resident
    BATCH = int(os.environ.get("HETPU_BENCH_BATCH", "8"))
    # chained steps per dispatch: the axon relay costs ~23 ms per dispatched
    # executable (scripts/probe_k.py), so short chains measure RPC overhead,
    # not the framework; a long scan chain amortizes it and stays a true
    # sequential dependency chain
    K = int(os.environ.get("HETPU_BENCH_K", "1536"))
    base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    a = base.with_(data=jnp.stack([base.data] * BATCH))
    b = b_ct.with_(data=jnp.stack([b_ct.data] * BATCH))

    def fold_into(x0, y):
        """XOR-fold EVERY element of y into an x0-shaped tag: each step's
        full output feeds the next step's input, so XLA cannot slice any
        elementwise stage down to a sampled tag (an 8-element tag lets
        the compiler prune work after the last opaque kernel)."""
        n0 = x0.size
        yf = jnp.ravel(y)
        k = -(-yf.size // n0)
        yf = jnp.pad(yf, (0, k * n0 - yf.size))
        folded = jax.lax.reduce(yf.reshape(k, n0), jnp.uint32(0),
                                jnp.bitwise_xor, (0,))
        return (folded & jnp.uint32(1)).reshape(x0.shape)

    @jax.jit
    def run(da, db, tag0):
        def body(tag, _):
            # fold the previous step's FULL output into the input: a true
            # sequential dependency chain across all K steps with every
            # output element consumed
            ca = a.with_(data=jnp.bitwise_xor(da, tag))
            out = sess.ev.multiply_relin_rescale(ca, b.with_(data=db),
                                                 sess.rk)
            return fold_into(da, out.data), ()
        tag, _ = jax.lax.scan(body, tag0, None, length=K)
        return tag

    sync = jax.jit(lambda t: jnp.sum(t, dtype=jnp.uint32))
    # compile + warmup
    tag = jnp.zeros_like(a.data)
    _ = int(sync(run(a.data, b.data, tag)))

    reps = int(os.environ.get("HETPU_BENCH_REPS", "2"))
    tag = jnp.zeros_like(a.data)
    t0 = time.perf_counter()
    for _ in range(reps):
        tag = run(a.data, b.data, tag)
    _ = int(sync(tag))                 # forces the whole chain
    dt = time.perf_counter() - t0

    ops_per_s = BATCH * K * reps / dt
    print(json.dumps({
        "metric": "ckks_mult_relin_rescale_n14_ops_per_s",
        "value": round(ops_per_s, 2),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / 10_000.0, 4),
    }))


if __name__ == "__main__":
    main()
