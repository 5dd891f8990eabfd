"""Isolate Pallas GRID-STEP overhead: a copy kernel at varying rb and
grid orderings (probe_kernel_parts r5 follow-up: copy ≈ dot ≈ extract
≈ recomb ≈ 4.4 us/plane → per-step cost dominates, not compute)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, L = 32, 9
n1 = n2 = 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 30, (ROWS, L, n1, n2),
                             dtype=np.uint32))


def make(rb, rows_first, par):
    def kernel(x_ref, o_ref):
        for p in range(rb):
            o_ref[p, 0] = x_ref[p, 0]

    grid = (ROWS // rb, L) if rows_first else (L, ROWS // rb)
    idx = (lambda r, l: (r, l, 0, 0)) if rows_first else \
          (lambda l, r: (r, l, 0, 0))
    sem = ("parallel", "parallel") if par else ("arbitrary", "arbitrary")

    def call(x):
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pl.BlockSpec((rb, 1, n1, n2), idx,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rb, 1, n1, n2), idx,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, L, n1, n2), jnp.uint32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        )(x)
    return call


def make_flat(rb):
    """Single-dim grid over row-blocks, limbs inside the block."""
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def call(x):
        return pl.pallas_call(
            kernel, grid=(ROWS // rb,),
            in_specs=[pl.BlockSpec((rb, L, n1, n2), lambda r: (r, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rb, L, n1, n2), lambda r: (r, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, L, n1, n2), jnp.uint32),
        )(x)
    return call


def bench(name, fn, K=20, iters=3):
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
        _ = int(chain(x))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K
    print(f"{name:34s} {dt*1e3:9.3f} ms ({dt/(ROWS*L)*1e6:6.2f} us/plane)",
          flush=True)


# XLA baseline: the same copy+xor chain without pallas
@jax.jit
def xla_chain(x):
    def body(c, _):
        o = c + jnp.uint32(1)
        return o ^ (o[..., :1, :1] & 1), ()
    out, _ = jax.lax.scan(body, x, None, length=20)
    return jnp.sum(out[..., :1, :8], dtype=jnp.uint32)


t0 = time.perf_counter(); _ = int(xla_chain(x)); print("xla compile", time.perf_counter()-t0, flush=True)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); _ = int(xla_chain(x)); ts.append(time.perf_counter()-t0)
print(f"{'xla add+xor (no pallas)':34s} {min(ts)/20*1e3:9.3f} ms", flush=True)

for rb in (8, 16, 32):
    bench(f"copy rb={rb} grid=(L,rows)", make(rb, False, False))
for rb in (8, 32):
    bench(f"copy rb={rb} grid=(L,rows) par", make(rb, False, True))
bench("copy rb=8  grid=(rows,L)", make(8, True, False))
for rb in (8, 16, 32):
    bench(f"copy flat rb={rb} (limbs inside)", make_flat(rb))
