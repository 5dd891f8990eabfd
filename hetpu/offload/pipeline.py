"""Multi-host pipeline stand-in: host-0 client → mesh-parallel evaluator
(VERDICT r2 item 9; SURVEY.md §2d "Pipeline/offload parallelism").

The reference's offload is a single-threaded evaluator behind a TCP
socket (``client.cpp`` / ``server.cpp``).  Here the evaluator side is a
*pod-slice analog*: it builds a ``dp`` mesh over ALL of its local
devices, shards the batch axis of the received ciphertexts, and runs the
encrypted step as ONE jitted sharded program.  The client side keeps the
reference's trust split — secret key never crosses the wire, evaluator
session comes from ``Session.from_wire`` (no decrypt path) — and the
transport reuses the size-prefixed wire format of ``core/serial``.

On one machine this runs against the 8-virtual-device CPU mesh (the
SURVEY §4 "multi-node-without-a-cluster" harness, like
``client_server_rookie.cpp``).  On real multi-host hardware the SAME
evaluator code spans processes: call ``jax.distributed.initialize()``
first (env ``HETPU_COORD=host:port``, ``HETPU_PROC_ID``,
``HETPU_NUM_PROCS``) and ``jax.devices()`` becomes the global pod slice;
nothing else changes.

``scripts/scaling_bench.py`` measures the scaling efficiency of the
evaluator step over mesh sizes — the harness that produces BASELINE.md's
2-host number when two hosts exist.
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import random as rnd, serial
from ..runtime import native
from ..session import Session
from . import recv_reply, recv_request, send_reply, send_request


def maybe_init_distributed() -> None:
    """Span processes over DCN when the env asks for it (no-op
    otherwise).  With HETPU_COORD set, jax.devices() afterwards covers
    every process's chips and the pipeline below is multi-host."""
    import os
    coord = os.environ.get("HETPU_COORD")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["HETPU_NUM_PROCS"]),
            process_id=int(os.environ["HETPU_PROC_ID"]))


def evaluate_sharded(sess: Session, cts, n_devices: int | None = None):
    """The evaluator-side pod program: batch the operand cts, shard the
    batch axis over a dp mesh of local devices, run ONE jitted
    mult+relin+rescale + rotate + accumulate step, return per-item cts."""
    devs = np.array(jax.devices())
    nd = int(n_devices or devs.size)
    mesh = Mesh(devs[:nd], axis_names=("dp",))
    if len(cts) % 2 != 0:
        raise ValueError(
            f"evaluate_sharded pairs operands: need an even ciphertext "
            f"count, got {len(cts)}")
    half = len(cts) // 2
    if half % nd != 0:
        raise ValueError(
            f"batch of {half} pairs does not divide the {nd}-device dp "
            "mesh; pad the request or pass n_devices")
    xa = jnp.stack([c.data for c in cts[:half]])
    xb = jnp.stack([c.data for c in cts[half:]])
    proto = cts[0]
    sh = NamedSharding(mesh, P("dp"))
    xa, xb = jax.device_put(xa, sh), jax.device_put(xb, sh)

    def step(da, db):
        prod = sess.ev.multiply_relin_rescale(
            proto.with_(data=da), proto.with_(data=db), sess.rk)
        rot = sess.ev.rotate(prod, 1, sess.gk)
        return sess.ev.add(prod, rot)

    with mesh:
        out = jax.jit(step, in_shardings=(sh, sh))(xa, xb)
    host = np.asarray(out.data)
    return [out.with_(data=host[i]) for i in range(half)]


def serve_pipeline(transport=None, n_devices: int | None = None) -> int:
    """Evaluator process: answer ONE pipeline request.  Returns the batch
    size served."""
    t = transport
    if t is None:
        maybe_init_distributed()
        t, _ = native.serve()
    try:
        header, sess, cts = recv_request(t)
        if header["workload"] != "pipeline":
            raise ValueError(f"expected pipeline, got {header['workload']!r}")
        results = evaluate_sharded(sess, cts, n_devices)
        send_reply(t, results)
        return len(results)
    finally:
        if transport is None:
            t.close()


def run_client(t, batch: int = 8, params="test_tiny", seed=None):
    """Client process: encrypt 2·batch operands (seeded symmetric — half
    wire size), offload, decrypt, verify against plaintext math.
    Returns (max_error, results)."""
    sess = Session.create(params, seed=seed, galois_steps=[1])
    rng = np.random.default_rng(0)
    vals = [rng.uniform(-1, 1, sess.slots) for _ in range(2 * batch)]
    pairs = []
    for v in vals:
        s = rnd.new_seed()
        pairs.append((sess.encryptor.encrypt_symmetric(sess.encode(v),
                                                       seed=s), s))
    send_request(t, "pipeline", sess.ctx.params, rk=sess.rk, gk=sess.gk,
                 cts=[c for c, _ in pairs], seeds=[s for _, s in pairs])
    res = recv_reply(t, sess.ctx)
    errs = []
    for i, ct in enumerate(res):
        got = sess.decrypt(ct).real
        w = vals[i] * vals[batch + i]
        errs.append(np.max(np.abs(got - (w + np.roll(w, -1)))))
    return float(np.max(errs)), res
