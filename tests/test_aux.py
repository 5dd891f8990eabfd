"""Auxiliary-subsystem tests (SURVEY.md §5): failure recovery on the
transport, structured metrics, and the sanitizer-analog debug audits."""

import json
import threading
import time

import numpy as np
import pytest

from hetpu.runtime import native


def test_connect_retries_until_server_up():
    """Reference clients perror+exit when the server isn't up yet
    (client.cpp:28-57); ours retries with backoff."""
    port = 18111
    results = {}

    def late_server():
        time.sleep(0.6)
        t, p = native.serve(port, port)
        results["server"] = t.recv()
        t.send(b"pong")
        t.close()

    th = threading.Thread(target=late_server)
    th.start()
    try:
        # immediate connect would fail; retries bridge the gap
        t = native.connect(port, port, retries=6, backoff=0.2)
        t.send(b"ping")
        assert t.recv() == b"pong"
        t.close()
    finally:
        th.join(timeout=30)
    assert results["server"] == b"ping"


def test_connect_no_retry_fails_fast():
    with pytest.raises(IOError):
        native.connect(18222, 18222, retries=0)


def test_metrics_jsonl(tmp_path, monkeypatch):
    from hetpu.utils import metrics
    from hetpu.utils.timer import Timer

    dst = tmp_path / "events.jsonl"
    monkeypatch.setenv("HETPU_METRICS", str(dst))
    metrics.emit("custom", answer=42)
    metrics.count("ops", 3)
    metrics.count("ops", 2)
    snap = metrics.dump_counters()
    t = Timer()
    t.toc("stage")
    lines = [json.loads(l) for l in dst.read_text().splitlines()]
    events = {l["event"] for l in lines}
    assert {"custom", "counters", "timer"} <= events
    assert snap["ops"] == 5.0
    timer_ev = [l for l in lines if l["event"] == "timer"][0]
    assert timer_ev["label"] == "stage" and timer_ev["seconds"] >= 0


def test_evaluator_determinism_and_no_aliasing(rng):
    """The race-detector analog: exact kernels must be bit-deterministic
    across runs, and must not silently alias caller buffers."""
    import jax
    from hetpu.session import Session
    from hetpu.utils import debug

    sess = Session.create("test_tiny", seed=b"\x51" * 32, galois_steps=[1])
    a = sess.encrypt(rng.uniform(-1, 1, sess.slots))
    b = sess.encrypt(rng.uniform(-1, 1, sess.slots))

    fn = jax.jit(lambda da, db: sess.ev.multiply_relin_rescale(
        a.with_(data=da), b.with_(data=db), sess.rk).data)
    debug.determinism_check(fn, a.data, b.data)
    debug.donation_audit(lambda da, db: sess.ev.multiply_relin_rescale(
        a.with_(data=da), b.with_(data=db), sess.rk).data,
        a.data, b.data, expect_aliases=0)
