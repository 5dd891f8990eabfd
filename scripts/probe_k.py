"""Is the ~1.2ms/step a per-CALL or per-SCAN-STEP cost?  Time the same
trivial chain at several K; per-call overhead shows as ms/step ~ 1/K."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(0, 1 << 30, (288, 128, 128), dtype=np.uint32))


def bench(K):
    @jax.jit
    def chain(x):
        def body(c, _):
            o = c ^ jnp.uint32(1)
            return o ^ (o[..., :1, :1] & 1), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out[..., :1, :8], dtype=jnp.uint32)
    r = chain(x0); jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = chain(x0); _ = int(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"K={K:4d}  call={dt*1e3:8.2f} ms   per-step={dt/K*1e3:7.3f} ms")


for K in (1, 5, 20, 100):
    bench(K)

# and a minimal single-op dispatch (no scan)
f = jax.jit(lambda x: jnp.sum(x[..., :1, :8] ^ jnp.uint32(1), dtype=jnp.uint32))
r = f(x0); jax.block_until_ready(r)
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    _ = int(f(x0))
    ts.append(time.perf_counter() - t0)
print(f"single dispatch+fetch: {min(ts)*1e3:.2f} ms")
