"""Genuinely multi-PROCESS jax.distributed exercise (SURVEY §4(c):
CPU-emulated multi-host before real pods; VERDICT r3 item 6).

Runs scripts/distributed_2proc.py — coordinator + worker process, a
global 8-device dp mesh spanning both, one sharded
mult+relin+rescale step, decrypt-verified in both processes."""

import pathlib
import subprocess
import sys


def test_two_process_distributed_mesh():
    script = pathlib.Path(__file__).resolve().parent.parent / "scripts" \
        / "distributed_2proc.py"
    out = subprocess.run(
        [sys.executable, str(script)], text=True, timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert out.returncode == 0, out.stdout[-2000:]
    assert "RESULT: PASS" in out.stdout
    assert out.stdout.count("DISTRIBUTED_OK") == 2
