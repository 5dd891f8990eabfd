"""BFV demos — exact integer arithmetic with noise-budget probes
(reference ``matrix_operations.cpp``: elemwise_square :140-209,
batch_matmul_bfv :351-493, matpow :631-743, each printing
``invariant_noise_budget`` before/after ops)."""

from __future__ import annotations

import numpy as np

from ..bfv import BfvSession
from ..utils import Timer


def _sess(small):
    t = Timer()
    s = BfvSession.create("test_bfv_tiny" if small else "bfv_small",
                          galois_steps=[1])
    t.toc("keygen+context time")
    return s


def demo_elemwise_square(small=False):
    """x² in slots with noise budgets (reference :140-209)."""
    sess = _sess(small)
    t_mod = sess.ctx.params.plain_modulus
    rng = np.random.default_rng(0)
    v = rng.integers(0, 1 << 10, sess.slots, dtype=np.int64)
    ct = sess.encrypt(v)
    print("noise budget fresh:", sess.noise_budget(ct), "bits")
    t = Timer()
    sq = sess.square_relin(ct)
    t.toc("HE square time")
    print("noise budget after square:", sess.noise_budget(sq), "bits")
    got = sess.decrypt(sq)
    want = (v * v) % t_mod
    print("exact:", bool(np.array_equal(got, want)), "| x^2[:4] =", got[:4])


def demo_batch_matmul_bfv(small=False):
    """2×2 matmul, one ct per element, all slots batched
    (reference :351-493 does 5×5 × 4096 slots)."""
    sess = _sess(small)
    t_mod = sess.ctx.params.plain_modulus
    rng = np.random.default_rng(0)
    batch = sess.slots
    A = rng.integers(0, 1 << 8, (2, 2, batch), dtype=np.int64)
    B = rng.integers(0, 1 << 8, (2, 2, batch), dtype=np.int64)
    cA = [[sess.encrypt(A[i, j]) for j in range(2)] for i in range(2)]
    cB = [[sess.encrypt(B[i, j]) for j in range(2)] for i in range(2)]
    t = Timer()
    out = [[None, None], [None, None]]
    for i in range(2):
        for j in range(2):
            acc = sess.multiply_relin(cA[i][0], cB[0][j])
            acc = sess.add(acc, sess.multiply_relin(cA[i][1], cB[1][j]))
            out[i][j] = acc
    t.toc("HE matrix multiplication time")
    print("noise budget:", sess.noise_budget(out[0][0]), "bits")
    got = np.stack([[sess.decrypt(out[i][j]) for j in range(2)]
                    for i in range(2)])
    want = np.einsum("ikb,kjb->ijb", A, B) % t_mod
    print(f"batch={batch} exact:", bool(np.array_equal(got, want)))


def demo_matpow_bfv(small=False):
    """A² (square, reference matpow does A⁵ via binary exponentiation —
    depth limited here by the tiny chain)."""
    sess = _sess(small)
    t_mod = sess.ctx.params.plain_modulus
    rng = np.random.default_rng(0)
    A = rng.integers(0, 1 << 6, (2, 2), dtype=np.int64)
    c = [[sess.encrypt(np.full(4, A[i, j])) for j in range(2)]
         for i in range(2)]
    t = Timer()
    out = [[sess.add(sess.multiply_relin(c[i][0], c[0][j]),
                     sess.multiply_relin(c[i][1], c[1][j]))
            for j in range(2)] for i in range(2)]
    t.toc("HE matrix power time")
    got = np.array([[int(sess.decrypt(out[i][j])[0]) for j in range(2)]
                    for i in range(2)])
    want = (A @ A) % t_mod
    print("A^2 exact:", bool(np.array_equal(got, want)), "\n", got)


DEMOS = {
    "elemwise_square": demo_elemwise_square,
    "batch_matmul_bfv": demo_batch_matmul_bfv,
    "matpow_bfv": demo_matpow_bfv,
}
