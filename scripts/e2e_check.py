import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from hetpu.utils.keycache import cached_session
sess = cached_session("bench_n14", seed=b"\x21" * 32, galois_steps=[1])
rng = np.random.default_rng(7)
x = rng.uniform(-1, 1, sess.slots)
y = rng.uniform(-1, 1, sess.slots)
cx, cy = sess.encrypt(x), sess.encrypt(y)
out = sess.ev.multiply_relin_rescale(cx, cy, sess.rk)
got = sess.decrypt(out)
err = np.max(np.abs(got.real - x * y))
print("max err:", err)
assert err < 2e-3, err
r = sess.ev.rotate(out, 1, sess.gk)
got2 = sess.decrypt(r)
err2 = np.max(np.abs(got2.real - np.roll(x * y, -1)))
print("rot err:", err2)
assert err2 < 1e-2
print("e2e ok")
