"""Separate per-launch vs per-byte costs: vary ROWS and rb."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

q = np.uint32((1 << 30) + 1)

def run(ROWS, L, rb, K=20):
    n1 = n2 = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, (ROWS, L, n1, n2), dtype=np.uint32))
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.uint32(1)
    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(ROWS // rb, L),
            in_specs=[pl.BlockSpec((rb, 1, n1, n2), lambda r, l: (r, l, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rb, 1, n1, n2), lambda r, l: (r, l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, L, n1, n2), jnp.uint32),
        )(x)
    @jax.jit
    def chain(x):
        def body(c, _):
            o = call(c)
            return o ^ (o[..., :1, :1] & 1), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out[..., :1, :8], dtype=jnp.uint32)
    r = chain(x); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = chain(x); _ = int(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K
    planes = ROWS * L
    mb = planes * 65536 * 2 / 1e6
    print(f"ROWS={ROWS:4d} L={L} rb={rb:3d}: {dt*1e3:8.3f} ms/launch  "
          f"{dt/planes*1e6:6.2f} us/plane  {mb/1e3/dt:6.1f} GB/s")

for rows, rb in ((32, 1), (32, 8), (32, 32), (128, 8), (128, 32), (128, 128)):
    run(rows, 9, rb)
# XLA elementwise for comparison
for ROWS in (32, 128):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, (ROWS, 9, 128, 128), dtype=np.uint32))
    @jax.jit
    def chain(x):
        def body(c, _):
            o = c + jnp.uint32(1)
            return o ^ (o[..., :1, :1] & 1), ()
        out, _ = jax.lax.scan(body, x, None, length=20)
        return jnp.sum(out[..., :1, :8], dtype=jnp.uint32)
    r = chain(x); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = chain(x); _ = int(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / 20
    planes = ROWS * 9
    print(f"XLA add ROWS={ROWS:4d}: {dt*1e3:8.3f} ms  {dt/planes*1e6:6.2f} us/plane  "
          f"{planes*65536*2/1e9/dt:6.1f} GB/s")
