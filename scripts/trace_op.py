import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from hetpu.utils.keycache import cached_session
from hetpu.core import mxu_ntt

mxu_ntt._FORCE = True; mxu_ntt._FORCE_IMPL = "pallas"
sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
rng = np.random.default_rng(0)
BATCH = 32
base = sess.encrypt(rng.uniform(-1, 1, sess.slots))
b_ct = sess.encrypt(rng.uniform(-1, 1, sess.slots))
a = base.with_(data=jnp.stack([base.data] * BATCH))
b = b_ct.with_(data=jnp.stack([b_ct.data] * BATCH))
ev = sess.ev

@jax.jit
def step(da, tag):
    ca = a.with_(data=da ^ tag)
    out = ev.multiply_relin_rescale(ca, b, sess.rk)
    return out.data, jnp.sum(out.data[..., :1, :1, :8], dtype=jnp.uint32) & jnp.uint32(1)

d, tag = step(a.data, jnp.uint32(0))
_ = int(tag)
jax.profiler.start_trace("/tmp/hetpu_trace")
tag = jnp.uint32(0)
for _ in range(5):
    d, tag = step(a.data, tag)
_ = int(tag)
jax.profiler.stop_trace()
print("trace done")
