"""Full fused op with pallas ip on/off, K=64 chain."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from hetpu.utils.keycache import cached_session
from hetpu.core import ip_kernel

sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
rng = np.random.default_rng(0)
B, K = int(__import__("os").environ.get("IPB", "8")), 64
base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
a = base.with_(data=jnp.stack([base.data] * B))
b = b_ct.with_(data=jnp.stack([b_ct.data] * B))


def bench(name):
    @jax.jit
    def chain(d):
        def body(c, _):
            o = sess.ev.multiply_relin_rescale(a.with_(data=c), b, sess.rk).data
            tag = jnp.sum(o.reshape(-1)[:8], dtype=jnp.uint32) & jnp.uint32(1)
            return a.data ^ tag, ()
        out, _ = jax.lax.scan(body, d, None, length=K)
        return jnp.sum(out.reshape(-1)[:8], dtype=jnp.uint32)
    r = chain(a.data); _ = int(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(chain(a.data))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} {best/K*1e3:8.3f} ms/step")


ip_kernel._FORCE = False
bench("jnp")
ip_kernel._FORCE = True
bench("pallas")
