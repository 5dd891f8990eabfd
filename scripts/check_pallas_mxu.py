"""Device check: Pallas MXU-NTT path vs the jnp reference path, all
epilogue variants, on the real TPU."""

import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax.numpy as jnp

from hetpu.core import mxu_ntt
from hetpu.core.ntt import build_best_tables
from hetpu.core import nt

N = 1 << 14
primes = nt.gen_primes(30, 3, 2 * N)[:3]
t = build_best_tables(N, primes)
mt = mxu_ntt.tables_for(t)
rng = np.random.default_rng(0)
x = rng.integers(0, min(primes), (5, 3, N), dtype=np.uint32)
xj = jnp.asarray(x)

for fwd in (True, False):
    for name in ("plain_fwd", "to_mont", "strip"):
        consts = getattr(mt, name)
        mxu_ntt._FORCE_IMPL = "pallas"
        a = np.asarray(mxu_ntt._run_pallas(xj, mt, forward=fwd,
                                           consts_last=consts))
        mxu_ntt._FORCE_IMPL = "jnp"
        x4 = xj.reshape(5, 3, t.n1, t.n2)
        f = mxu_ntt._fwd_jnp if fwd else mxu_ntt._inv_jnp
        b = np.asarray(f(x4, mt, consts)).reshape(5, 3, N)
        ok = np.array_equal(a, b)
        print(f"fwd={fwd} {name}: exact={ok}")
        assert ok
print("all exact")
