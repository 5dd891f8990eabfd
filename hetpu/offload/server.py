"""Blind evaluator (reference ``src/demos/server.cpp``).

Builds its HE context from the wire, computes on encrypted operands only,
returns encrypted results.  Contains no decryption path anywhere (trust
parity with the reference: ``server.cpp`` has no Decryptor).

Note: the reference's ``server_side_inv_sqrt_twice`` actually calls
``signed_inv`` — a copy-paste bug (``server.cpp:356``, SURVEY.md §2c).
We implement the *intended* behavior (1/√(2x)).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import fft as hefft
from .. import math as hemath
from ..runtime import native
from . import recv_request, send_reply


def _stack(sess, cts):
    """Operand list → one batched ciphertext, dp-sharded over the local
    device mesh when possible (the evaluator pod runs the REAL workloads
    sharded, not just the demo step — every downstream jitted op
    propagates the batch-axis sharding; cross-batch reductions lower to
    XLA collectives).  ``HETPU_SERVER_MESH=0`` disables."""
    data = jnp.stack([c.data for c in cts])
    nd = len(jax.devices())
    if (os.environ.get("HETPU_SERVER_MESH", "1") != "0"
            and nd > 1 and len(cts) % nd == 0):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()), axis_names=("dp",))
        data = jax.device_put(data, NamedSharding(mesh, P("dp")))
    return cts[0].with_(data=data)


def handle(header, sess, cts):
    """Dispatch one workload (reference server_side_* bodies)."""
    w = header["workload"]
    ev = sess.ev
    if w == "simple":                          # server.cpp:131-137
        out = ev.multiply_relin_rescale(cts[0], cts[1], sess.rk)
        return [out]
    if w == "batch_matmul":                    # server.cpp:161-237
        from ..linalg.matrix import Matrix
        m, n, p = header["dims"]
        a = Matrix(sess, _stack(sess, cts[: m * n]), m, n)
        b = Matrix(sess, _stack(sess, cts[m * n:]), n, p)
        out = a.matmul(b)
        return [out.ct.with_(data=out.ct.data[i]) for i in range(m * p)]
    if w == "inv":                             # server.cpp:289
        return [hemath.signed_inv(sess, cts[0], header["guess"],
                                  header["iters"])]
    if w == "inv_sqrt_twice":                  # server.cpp:356 (bug fixed)
        return [hemath.inv_sqrt_twice(sess, cts[0], header["guess"],
                                      header["iters"])]
    if w == "abs":                             # server.cpp:422
        return [hemath.abs_(sess, cts[0], header["guess"], header["iters"])]
    if w == "twice_max":                       # server.cpp:489-503
        return [hemath.twice_max(sess, cts[0], cts[1], header["guess"],
                                 header["iters"])]
    if w == "fft":                             # server.cpp:569
        out = hefft.fft(sess, _stack(sess, cts))
        return [out.with_(data=out.data[i]) for i in range(out.data.shape[0])]
    raise ValueError(f"unknown workload {w!r}")


def serve_once(transport=None) -> str:
    """Accept one connection (or use the given transport), answer one
    request.  Returns the workload name."""
    t = transport
    port = None
    if t is None:
        t, port = native.serve()
    try:
        header, sess, cts = recv_request(t)
        results = handle(header, sess, cts)
        send_reply(t, results)
        return header["workload"]
    finally:
        if transport is None:
            t.close()


def main(workload: str | None = None):
    print(f"hetpu server: listening on 127.0.0.1:{native.PORT_LO}-{native.PORT_HI}")
    w = serve_once()
    print(f"hetpu server: served workload {w!r}")


if __name__ == "__main__":
    main()
