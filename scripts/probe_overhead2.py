import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

q = np.uint32((1 << 30) + 1)

def timeit(label, chain, x, K):
    r = chain(x); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = chain(x); _ = int(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K
    print(f"{label:44s} {dt*1e3:8.3f} ms/iter")

rng = np.random.default_rng(0)
for ROWS in (32,):
    x = jnp.asarray(rng.integers(0, q, (ROWS, 9, 128, 128), dtype=np.uint32))
    # 1 XLA op per iteration
    @jax.jit
    def chain1(x):
        def body(c, _):
            o = c + jnp.uint32(1)
            return o ^ (o[..., :1, :1] & 1), ()
        out, _ = jax.lax.scan(body, x, None, length=20)
        return jnp.sum(out[..., :1, :8], dtype=jnp.uint32)
    timeit(f"XLA 1 fused add (ROWS={ROWS})", chain1, x, 20)
    # 8 dependent elementwise mults per iteration (should fuse into 1)
    @jax.jit
    def chain8(x):
        def body(c, _):
            o = c
            for _ in range(8):
                o = o * jnp.uint32(2654435761) + jnp.uint32(1)
            return o ^ (o[..., :1, :1] & 1), ()
        out, _ = jax.lax.scan(body, x, None, length=20)
        return jnp.sum(out[..., :1, :8], dtype=jnp.uint32)
    timeit(f"XLA 8 chained u32 mults (ROWS={ROWS})", chain8, x, 20)
    # 8 pallas launches per iteration
    def pcall(c):
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] * jnp.uint32(2654435761) + jnp.uint32(1)
        return pl.pallas_call(
            kernel,
            grid=(ROWS // 8, 9),
            in_specs=[pl.BlockSpec((8, 1, 128, 128), lambda r, l: (r, l, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 1, 128, 128), lambda r, l: (r, l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 9, 128, 128), jnp.uint32),
        )(c)
    for NP_ in (1, 2, 8):
        @jax.jit
        def chainp(x, NP_=NP_):
            def body(c, _):
                o = c
                for _ in range(NP_):
                    o = pcall(o)
                return o ^ (o[..., :1, :1] & 1), ()
            out, _ = jax.lax.scan(body, x, None, length=20)
            return jnp.sum(out[..., :1, :8], dtype=jnp.uint32)
        timeit(f"{NP_} pallas launches/iter (ROWS={ROWS})", chainp, x, 20)
