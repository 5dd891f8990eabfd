"""Isolate Pallas kernel costs: s8 dot, extract, recombine, twiddle."""
import time
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, L = 32, 9
PLANES = ROWS * L
n1 = n2 = 128
rng = np.random.default_rng(0)
q = np.uint32((1 << 30) + 1)  # dummy odd modulus

x = jnp.asarray(rng.integers(0, q, (ROWS, L, n1, n2), dtype=np.uint32))
w_s8 = jnp.asarray(rng.integers(-128, 128, (L, 512, 512), dtype=np.int8))
tw = jnp.asarray(rng.integers(0, q, (L, n1, n2), dtype=np.uint32))
tws = jnp.asarray(((tw.astype(np.uint64) << 32) // q).astype(np.uint32))

from hetpu.core.mxu_ntt import _extract_digit_list, _shoup_scalarish, _OFF

def make(variant, rb=8):
    def kernel(x_ref, w_ref, tw_ref, tws_ref, o_ref):
        l = pl.program_id(1)
        for p in range(rb):
            xx = x_ref[p, 0]
            if variant == "dot":
                xs = jnp.concatenate([xx.astype(jnp.int8)] * 4, axis=0)
                g = jax.lax.dot_general(w_ref[l], xs, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                o_ref[p, 0] = g[:n1].astype(jnp.uint32)
            elif variant == "dot2":
                xs = jnp.concatenate([xx.astype(jnp.int8)] * 4, axis=0)
                g = jax.lax.dot_general(w_ref[l], xs, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                g2 = jax.lax.dot_general(w_ref[l], g.astype(jnp.int8),
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.int32)
                o_ref[p, 0] = g2[:n1].astype(jnp.uint32)
            elif variant == "extract":
                ds = _extract_digit_list(xx, q, q // 2)
                o_ref[p, 0] = (ds[0].astype(jnp.uint32) ^ ds[1].astype(jnp.uint32)
                               ^ ds[2].astype(jnp.uint32) ^ ds[3].astype(jnp.uint32))
            elif variant == "recomb":   # 4 shoup muls + mod adds
                acc = None
                for j in range(4):
                    t = _shoup_scalarish(xx + jnp.uint32(j), tw_ref[l, 0, j],
                                         tws_ref[l, 0, j], q)
                    acc = t if acc is None else jnp.where(acc + t >= q, acc + t - q, acc + t)
                o_ref[p, 0] = acc
            elif variant == "twiddle":  # 1 elementwise shoup with table
                o_ref[p, 0] = _shoup_scalarish(xx, tw_ref[l], tws_ref[l], q)
            elif variant == "copy":
                o_ref[p, 0] = xx
    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(ROWS // rb, L),
            in_specs=[
                pl.BlockSpec((rb, 1, n1, n2), lambda r, l: (r, l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rb, 1, n1, n2), lambda r, l: (r, l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, L, n1, n2), jnp.uint32),
        )(x, w_s8, tw, tws)
    return call

def bench(name, fn, x, K=200, iters=3):
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
    print(f"{name:22s} {dt*1e3:8.3f} ms ({dt/PLANES*1e6:6.2f} us/plane)")

for v in ("copy", "dot", "dot2", "extract", "twiddle", "recomb"):
    bench(v, make(v), x)
