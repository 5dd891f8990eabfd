"""Feasibility probe: s8 x s8 -> s32 matmul throughput on the TPU.

Chains K dependent dots inside ONE jit so the remote-dispatch latency of
the axon tunnel (~1ms/call) is amortized away.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 40  # chained dots per jit call


def bench(name, fn, *args, iters=5, macs=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / K
    eff = f"  {macs/dt/1e12:7.1f} TMAC/s" if macs else ""
    print(f"{name:34s} {dt*1e6:9.1f} us/dot{eff}")


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    B = 288
    a = jnp.asarray(rng.integers(-128, 128, (B, 512, 128), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (512, 512), dtype=np.int8))
    macs = B * 512 * 512 * 128

    def one(w, x):
        o = jax.lax.dot_general(w, x, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # feed back as int8 to chain dependency: [512,B,128]->[B,512,128]
        return jnp.moveaxis(o, 1, 0).astype(jnp.int8)

    @jax.jit
    def chain(w, a):
        def body(x, _):
            return one(w, x), ()
        out, _ = jax.lax.scan(body, a, None, length=K)
        return out

    bench("xla s8 [512,512]@[288,512,128]", chain, w, a, macs=macs)

    # pallas per-plane version
    def kernel(w_ref, a_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            a_ref[0], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def pl_dot(w, x):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 512, 128), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 512, 128), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 512, 128), jnp.int32),
        )(w, x)
    # note: contracts a's 512 with w rows -> [B,512?,...] shape game is moot
    # for perf probing; exactness of XLA path was already proven.

    @jax.jit
    def chain_pl(w, a):
        def body(x, _):
            return pl_dot(w, x).astype(jnp.int8), ()
        out, _ = jax.lax.scan(body, a, None, length=K)
        return out

    try:
        bench("pallas s8 per-plane dot", chain_pl, w, a, macs=macs)
    except Exception as e:
        print("PALLAS FAILED:", type(e).__name__, str(e)[:300])

    # pallas with 8 planes per program (amortize grid overhead)
    def kernel8(w_ref, a_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def pl_dot8(w, x):
        return pl.pallas_call(
            kernel8,
            grid=(B // 8,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 512, 128), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 512, 128), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 512, 128), jnp.int32),
        )(w, x)

    @jax.jit
    def chain_pl8(w, a):
        def body(x, _):
            return pl_dot8(w, x).astype(jnp.int8), ()
        out, _ = jax.lax.scan(body, a, None, length=K)
        return out

    try:
        bench("pallas s8 8-plane dot", chain_pl8, w, a, macs=macs)
    except Exception as e:
        print("PALLAS8 FAILED:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
