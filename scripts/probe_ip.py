"""Micro: pallas ip_kernel vs jnp broadcast inner product on TPU."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from hetpu.core import ip_kernel

B, J, R, N = 8, 2, 14, 1 << 14
rng = np.random.default_rng(0)
qn = (rng.integers(1 << 29, 1 << 30, R, dtype=np.uint32) | 1).reshape(R, 1)
ext = jnp.asarray(rng.integers(0, qn.min(), (B, J, R, N), dtype=np.uint32))
k = jnp.asarray(rng.integers(0, qn.min(), (J, 2, R, N), dtype=np.uint32))
ks = jnp.asarray((k.astype(np.uint64) << 32) // qn.astype(np.uint64)
                 if False else k)  # companion values don't matter for timing
q = jnp.asarray(qn)


def bench(name, f, K=100):
    @jax.jit
    def chain(x):
        def body(c, _):
            o = f(c)
            tag = (o[..., 0, :, :] ^ o[..., 1, :, :]) & jnp.uint32(1)
            return c ^ tag[:, None], ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out[..., :1, :1, :8], dtype=jnp.uint32)
    r = chain(ext); _ = int(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(chain(ext))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} {best/K*1e3:8.3f} ms/step")


bench("jnp", lambda e: ip_kernel.inner_product_jnp(e, k, ks, q))
ip_kernel._FORCE = True
bench("pallas", lambda e: ip_kernel.inner_product(e, k, ks, q))
