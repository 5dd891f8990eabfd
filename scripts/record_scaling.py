"""Record scaling efficiency into SCALING.json (VERDICT r4 missing #3:
the BASELINE '≥80% on 2 hosts' axis needs its best-available stand-in
checked in).

Runs scaling_bench in dp and tp modes on the 8-virtual-device CPU mesh
and the genuinely-two-process jax.distributed harness
(scripts/distributed_2proc.py), and merges the JSON lines.
"""
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "SCALING.json"


def run_mode(mode: str) -> list:
    env = dict(os.environ, HETPU_SCALE_CPU="8", HETPU_SCALE_MODE=mode,
               PYTHONPATH=str(ROOT))
    p = subprocess.run([sys.executable, "scripts/scaling_bench.py"],
                       cwd=ROOT, env=env, capture_output=True, text=True,
                       timeout=3600)
    rows = []
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
    if not rows:
        rows = [{"error": (p.stderr or p.stdout).strip()[-400:]}]
    return rows


def run_2proc() -> dict:
    p = subprocess.run([sys.executable, "scripts/distributed_2proc.py"],
                       cwd=ROOT, env=dict(os.environ, PYTHONPATH=str(ROOT)),
                       capture_output=True, text=True, timeout=3600)
    tail = "\n".join((p.stdout + p.stderr).strip().splitlines()[-6:])
    return {"ok": p.returncode == 0, "tail": tail}


def main():
    data = {"meta": {"recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
                     "note": "8-virtual-CPU-device mesh stand-in for the "
                             "2-host axis (single real chip available); "
                             "dp = weak-scaling fused-op throughput, "
                             "tp = strong-scaling limb-sharded relin, "
                             "two_process = jax.distributed 2-proc mesh. "
                             "CAVEAT: all virtual devices share ONE host "
                             "CPU, so these measure the sharded programs' "
                             "correctness and collective-overhead floor, "
                             "not real chip scaling — on real chips each "
                             "mesh step adds compute capacity these "
                             "numbers cannot show."}}
    for mode in ("dp", "tp"):
        print(f"[record_scaling] mode={mode} ...", flush=True)
        data[mode] = run_mode(mode)
        print(f"  {data[mode]}", flush=True)
    print("[record_scaling] two-process ...", flush=True)
    data["two_process"] = run_2proc()
    print(f"  {data['two_process']}", flush=True)
    OUT.write_text(json.dumps(data, indent=1) + "\n")
    print(f"[record_scaling] wrote {OUT}")


if __name__ == "__main__":
    main()
