"""Compare NTT kernel implementations on the live device + TPU-side
bit-exactness of the Pallas MXU path vs the jnp MXU path."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from hetpu.core import ntt4, mxu_ntt, pallas_ntt, nt

n = 1 << 14
primes = nt.gen_primes(30, 9, 2 * n)
t = ntt4.build_tables(n, primes)
rng = np.random.default_rng(0)
q = np.array(primes, dtype=np.uint32).reshape(-1, 1)
x = jnp.asarray(rng.integers(0, 2**31, (32, 9, n), dtype=np.uint32) % q)

# --- exactness: pallas-mxu vs jnp-mxu on device
mxu_ntt._FORCE_IMPL = "pallas"
f_p = np.asarray(mxu_ntt.ntt_fwd(x, t))
i_p = np.asarray(mxu_ntt.ntt_inv(x, t, strip_mont=True))
m_p = np.asarray(mxu_ntt.ntt_fwd(x, t, to_mont=True))
mxu_ntt._FORCE_IMPL = "jnp"
f_j = np.asarray(mxu_ntt.ntt_fwd(x, t))
i_j = np.asarray(mxu_ntt.ntt_inv(x, t, strip_mont=True))
m_j = np.asarray(mxu_ntt.ntt_fwd(x, t, to_mont=True))
print("pallas-mxu fwd exact:", (f_p == f_j).all())
print("pallas-mxu inv exact:", (i_p == i_j).all())
print("pallas-mxu mont exact:", (m_p == m_j).all())
mxu_ntt._FORCE_IMPL = None

def bench(name, fn, x, K=10, iters=3):
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
        r = chain(x)
        _ = int(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K
    print(f"{name:34s} {dt*1e3:9.3f} ms  ({dt/288*1e6:6.2f} us/plane)")

mxu_ntt._FORCE = False
pallas_ntt._FORCE = True
bench("pallas butterflies fwd", lambda c: ntt4.ntt_fwd(c, t), x)
bench("pallas butterflies inv", lambda c: ntt4.ntt_inv(c, t), x)
pallas_ntt._FORCE = False
mxu_ntt._FORCE = True
mxu_ntt._FORCE_IMPL = "pallas"
bench("mxu pallas fwd", lambda c: ntt4.ntt_fwd(c, t), x)
bench("mxu pallas inv", lambda c: ntt4.ntt_inv(c, t), x)
mxu_ntt._FORCE_IMPL = "jnp"
bench("mxu xla fwd", lambda c: ntt4.ntt_fwd(c, t), x)
bench("mxu xla inv", lambda c: ntt4.ntt_inv(c, t), x)
