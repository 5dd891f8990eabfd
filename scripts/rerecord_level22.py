"""Re-record the levels_22 sweep row of BENCH_WORKLOADS.json.

The existing row predates the Timer host-transfer fix (it was recorded
through a block_until_ready that returns early on the remote backend)
and is annotated UNRELIABLE.  Records the same per-dispatch fallback
methodology as the levels 18/26 rows at HEAD.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hetpu.core.params import chain_sweep
from hetpu.demos.math_operations import bench_he_all, bench_he_all_chained
from hetpu.session import Session

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main():
    for lv, params in chain_sweep(1 << 15, 2, 26):
        if lv != 22:
            continue
        import time
        t0 = time.perf_counter()
        sess = Session.create(params, galois_steps=[1])
        print(f"session created in {time.perf_counter()-t0:.1f}s", flush=True)
        # straight to per-dispatch timing: the scan-chained program at
        # this depth exceeds the remote-compile payload limit (levels
        # 18/26 rows fell back the same way) and the failed compile
        # attempt alone costs minutes
        t0 = time.perf_counter()
        times = bench_he_all(sess)
        note = "per-dispatch fallback"
        print(f"bench_he_all in {time.perf_counter()-t0:.1f}s", flush=True)
        row = {k: round(v * 1e3, 3) for k, v in times.items()}
        print("levels_22:", row, flush=True)
        path = ROOT / "BENCH_WORKLOADS.json"
        doc = json.loads(path.read_text())
        doc["sweep"]["levels_22"] = row
        if note:
            doc["sweep"]["levels_22_note"] = note
        else:
            doc["sweep"].pop("levels_22_note", None)
        path.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
        print("BENCH_WORKLOADS.json updated")


if __name__ == "__main__":
    main()
