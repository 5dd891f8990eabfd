"""Client/server encrypted-compute offload.

Parity with the reference's distributed layer (SURVEY.md §3.3, L3'):
``src/demos/client.cpp`` (trusted initiator: keygen, encode, symmetric
encrypt, serialize, decrypt) / ``src/demos/server.cpp`` (blind evaluator:
builds context FROM THE WIRE, computes on ciphertexts only, never holds a
secret key) / ``client_server_rookie.cpp`` (same protocol through an
in-process pipe — the test harness).

Wire protocol per request (all frames size-prefixed, runtime/native.py):
  1. JSON header  {workload, meta...}
  2. params blob
  3. relin-keys blob          (empty frame if not needed)
  4. galois-keys blob         (empty frame if not needed)
  5..n operand ciphertext blobs (symmetric-seeded: half wire size)
Reply: k result ciphertext frames (count in a JSON header frame).

Trust boundary preserved: the secret key never crosses the wire; the
server-side session is built by ``Session.from_wire`` which cannot
decrypt.
"""

from __future__ import annotations

import json

from ..core import serial
from ..runtime.native import Transport

__all__ = ["send_request", "recv_request", "send_reply", "recv_reply"]


def send_request(t: Transport, workload: str, params, rk=None, gk=None,
                 cts=(), seeds=None, meta=None) -> None:
    header = {"workload": workload, "num_cts": len(cts), **(meta or {})}
    t.send(json.dumps(header).encode())
    t.send(serial.dump_params(params))
    t.send(serial.dump_relin_keys(rk) if rk is not None else b"")
    t.send(serial.dump_galois_keys(gk) if gk is not None else b"")
    for i, ct in enumerate(cts):
        seed = seeds[i] if seeds else None
        t.send(serial.dump_ciphertext(ct, seed=seed))


def recv_request(t: Transport):
    header = json.loads(t.recv().decode())
    params = serial.load_params(t.recv())
    rk_blob = t.recv()
    gk_blob = t.recv()
    from ..core.context import Context
    ctx = Context(params)
    rk = serial.load_relin_keys(rk_blob, ctx) if rk_blob else None
    gk = serial.load_galois_keys(gk_blob, ctx) if gk_blob else None

    from ..session import Session
    sess = Session.from_wire(params, rk=rk, gk=gk)
    cts = [serial.load_ciphertext(t.recv(), sess.ctx)
           for _ in range(header["num_cts"])]
    return header, sess, cts


def send_reply(t: Transport, cts) -> None:
    t.send(json.dumps({"num_cts": len(cts)}).encode())
    for ct in cts:
        t.send(serial.dump_ciphertext(ct))


def recv_reply(t: Transport, ctx):
    header = json.loads(t.recv().decode())
    return [serial.load_ciphertext(t.recv(), ctx)
            for _ in range(header["num_cts"])]
