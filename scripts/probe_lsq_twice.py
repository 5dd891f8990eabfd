"""Run the least-squares flagship TWICE in one process to split its wall
time into per-(op,level) first-call cost (trace + executable load over
the remote-compile relay — paid once per unique kernel) vs the actual
pipelined device time (VERDICT r5 follow-up on the lsq wall regression).
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import time

import numpy as np

from hetpu.models.least_squares import least_squares_2d
from hetpu.utils.keycache import cached_session


def run_once(sess, rng):
    n = 5
    x = rng.uniform(0.5, 2.0, n)
    y = 0.7 * x + 0.3 + rng.normal(0, 0.02, n)
    px, py = np.zeros(sess.slots), np.zeros(sess.slots)
    px[:n], py[:n] = x, y
    sx, sxx = x.sum(), (x * x).sum()
    D = n * sxx - sx * sx
    t0 = time.perf_counter()
    ct_a, ct_b = least_squares_2d(sess, sess.encrypt(px), sess.encrypt(py),
                                  n, inv_guess=1.0 / D, inv_iters=6)
    a = sess.decrypt(ct_a).real[0]          # forces the whole pipeline
    b = sess.decrypt(ct_b).real[0]
    dt = time.perf_counter() - t0
    sy, sxy = y.sum(), (x * y).sum()
    ea, eb = (n * sxy - sx * sy) / D, (sxx * sy - sx * sxy) / D
    err = max(abs(a - ea), abs(b - eb))
    return dt, err


def main():
    sess = cached_session("ckks_deep_hi", seed=b"\x77" * 32,
                          galois_steps=[1, 2, 4])
    rng = np.random.default_rng(0)
    t1, e1 = run_once(sess, rng)
    print(f"first run:  {t1:.1f}s err={e1:.2e}", flush=True)
    t2, e2 = run_once(sess, rng)
    print(f"second run: {t2:.1f}s err={e2:.2e}", flush=True)
    out = {"first_run_s": round(t1, 1), "warm_process_s": round(t2, 1),
           "first_call_overhead_s": round(t1 - t2, 1),
           "max_err": float(max(e1, e2))}
    pathlib.Path("PROBE_LSQ.json").write_text(json.dumps(out, indent=1)
                                              + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
