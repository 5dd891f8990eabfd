"""Full multiply_relin_rescale chained inside ONE jit (scan) to amortize
dispatch: honest per-op device time for each NTT backend."""
import time
import numpy as np
import jax, jax.numpy as jnp
from hetpu.utils.keycache import cached_session
from hetpu.core import mxu_ntt, pallas_ntt

sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
rng = np.random.default_rng(0)
BATCH = 32
base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
a = base.with_(data=jnp.stack([base.data] * BATCH))
b = b_ct.with_(data=jnp.stack([b_ct.data] * BATCH))
ev = sess.ev

K = 10
def run(label):
    @jax.jit
    def chain(da, db):
        def body(tag, _):
            ca = a.with_(data=da ^ tag)
            out = ev.multiply_relin_rescale(ca, b.with_(data=db), sess.rk)
            t = jnp.sum(out.data[..., :1, :1, :8], dtype=jnp.uint32) & jnp.uint32(1)
            return t, ()
        tag, _ = jax.lax.scan(body, jnp.uint32(0), None, length=K)
        return tag
    r = chain(a.data, b.data); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = chain(a.data, b.data); _ = int(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K
    print(f"{label:26s} {dt*1e3:8.3f} ms/op-batch  -> {BATCH/dt:8.1f} ops/s")

mxu_ntt._FORCE = False; pallas_ntt._FORCE = True
run("butterfly pallas")
pallas_ntt._FORCE = False; mxu_ntt._FORCE = True; mxu_ntt._FORCE_IMPL = "pallas"
run("mxu pallas")
mxu_ntt._FORCE_IMPL = "jnp"
run("mxu xla")
