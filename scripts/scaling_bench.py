"""Scaling-efficiency harness for the evaluator-side sharded step
(BASELINE.md: ≥80% scaling efficiency on 2 hosts — this produces that
number when ≥2 hosts exist; until then it reports dp-mesh scaling over
the local/virtual device set as the stand-in).

Usage:
  python scripts/scaling_bench.py                 # real backend
  HETPU_SCALE_CPU=8 python scripts/scaling_bench.py   # 8 virtual CPU devs
  # multi-host: HETPU_COORD=host:port HETPU_NUM_PROCS=2 HETPU_PROC_ID=...

Prints one JSON line per mesh size: {"n_devices", "ops_per_s",
"efficiency_vs_1dev"}.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

_cpu = os.environ.get("HETPU_SCALE_CPU")
if _cpu:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={_cpu}").strip()

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

if _cpu:
    jax.config.update("jax_platforms", "cpu")

from hetpu.offload.pipeline import maybe_init_distributed
from hetpu.utils.keycache import cached_session


def bench_mesh(sess, nd: int, per_dev_batch: int, K: int, reps: int) -> float:
    """Weak-scaling ops/s of the fused op on an nd-device dp mesh
    (per-device batch held constant — the pod-serving shape)."""
    devs = np.array(jax.devices()[:nd])
    mesh = Mesh(devs, axis_names=("dp",))
    B = per_dev_batch * nd
    rng = np.random.default_rng(0)
    a = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    da = jnp.stack([a.data] * B)
    db = jnp.stack([b.data] * B)
    sh = NamedSharding(mesh, P("dp"))
    da, db = jax.device_put(da, sh), jax.device_put(db, sh)

    @jax.jit
    def run(xa, xb, tag0):
        def body(tag, _):
            ca = a.with_(data=jnp.bitwise_xor(xa, tag))
            out = sess.ev.multiply_relin_rescale(ca, b.with_(data=xb),
                                                 sess.rk)
            return (jnp.sum(out.data[..., :1, :1, :8], dtype=jnp.uint32)
                    & jnp.uint32(1)), ()
        tag, _ = jax.lax.scan(body, tag0, None, length=K)
        return tag

    with mesh:
        _ = int(run(da, db, jnp.uint32(0)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            t = run(da, db, jnp.uint32(0))
            _ = int(t)
            best = min(best, time.perf_counter() - t0)
    return B * K / best


def bench_tp(sess, nd: int, K: int, reps: int) -> float:
    """STRONG-scaling relinearize/s with the key basis limb-sharded over
    an nd-device tp mesh (parallel.tp cached kernels) — the latency
    analog of the dp mode's throughput number."""
    from hetpu.parallel import tp as tpmod
    rng = np.random.default_rng(0)
    x = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    c3 = sess.ev.multiply(x, x)
    if nd == 1:
        fn = lambda: sess.ev.relinearize(c3, sess.rk)
    else:
        mesh = Mesh(np.array(jax.devices()[:nd]), axis_names=("tp",))
        fn = lambda: tpmod.tp_relinearize(sess, c3, mesh)
    jax.block_until_ready(fn().data)          # compile + cache warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn()
        jax.block_until_ready(out.data)
        best = min(best, time.perf_counter() - t0)
    return K / best


def main():
    maybe_init_distributed()
    mode = os.environ.get("HETPU_SCALE_MODE", "dp")      # dp | tp
    # tp needs the data-limb count divisible by the mesh size:
    # test_dnum (8 data limbs) on CPU, bench_n14 (9 → sizes 1/3) on TPU
    default_preset = ("test_dnum" if mode == "tp" else "test_tiny") \
        if _cpu else "bench_n14"
    preset = os.environ.get("HETPU_SCALE_PRESET", default_preset)
    K = int(os.environ.get("HETPU_SCALE_K", "8" if _cpu else "96"))
    per_dev = int(os.environ.get("HETPU_SCALE_BATCH", "4" if _cpu else "32"))
    sess = cached_session(preset, seed=b"\x21" * 32, galois_steps=[1])
    n_all = len(jax.devices())
    L = sess.ctx.num_data
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_all
             and (mode != "tp" or L % n == 0)]
    base = None
    for nd in sizes:
        if mode == "tp":
            ops = bench_tp(sess, nd, K, reps=3)
            # strong scaling: speedup vs 1 device (ideal = nd)
            if base is None:
                base = ops
            print(json.dumps({"mode": "tp", "n_devices": nd,
                              "relin_per_s": round(ops, 1),
                              "speedup_vs_1dev": round(ops / base, 3)}),
                  flush=True)
            continue
        ops = bench_mesh(sess, nd, per_dev, K, reps=3)
        if base is None:
            base = ops
        eff = ops / (base * nd)
        print(json.dumps({"mode": "dp", "n_devices": nd,
                          "ops_per_s": round(ops, 1),
                          "efficiency_vs_1dev": round(eff, 4)}), flush=True)


if __name__ == "__main__":
    main()
