"""Isolate fixed overheads: per-scan-step vs per-pallas-call vs per-byte.

Times scan chains whose bodies are: pure-jnp xor; 1 pallas copy; 2 pallas
copies; 4 pallas copies; 1 copy at 2x data; 1 copy at 4x data.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n1 = n2 = 128
rng = np.random.default_rng(0)


def copy_call(rows, rb=8):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(rows // rb,),
            in_specs=[pl.BlockSpec((rb, n1, n2), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rb, n1, n2), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, n1, n2), jnp.uint32),
        )(x)
    return call


def bench(name, fn, x, K=20, iters=3):
    @jax.jit
    def chain(x):
        def body(c, _):
            o = fn(c)
            return o ^ (o[..., :1, :1] & 1), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out[..., :1, :8], dtype=jnp.uint32)
    r = chain(x); jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = chain(x); _ = int(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K
    print(f"{name:28s} {dt*1e3:8.3f} ms/step")


x1 = jnp.asarray(rng.integers(0, 1 << 30, (288, n1, n2), dtype=np.uint32))
x2 = jnp.asarray(rng.integers(0, 1 << 30, (576, n1, n2), dtype=np.uint32))
x4 = jnp.asarray(rng.integers(0, 1 << 30, (1152, n1, n2), dtype=np.uint32))

c1, c2_, c4 = copy_call(288), copy_call(576), copy_call(1152)

bench("jnp xor only", lambda v: v ^ jnp.uint32(1), x1)
bench("1 pallas copy (288pl)", c1, x1)
bench("2 pallas copies (288pl)", lambda v: c1(c1(v)), x1)
bench("4 pallas copies (288pl)", lambda v: c1(c1(c1(c1(v)))), x1)
bench("1 pallas copy (576pl)", c2_, x2)
bench("1 pallas copy (1152pl)", c4, x4)
bench("jnp roundtrip copy", lambda v: (v + jnp.uint32(1)) - jnp.uint32(1), x1)
