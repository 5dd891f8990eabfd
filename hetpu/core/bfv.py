"""BFV scheme: exact integer arithmetic on encrypted data.

Replaces the SEAL BFV path the reference uses in 4 demos
(``matrix_operations.cpp``: elemwise_square :140-209, matmul :211-349,
batch_matmul_bfv :351-493, matpow :631-743) plus the
``invariant_noise_budget`` probes (:195-199, 479-480, 724-725).

TPU-native design decisions:
* BFV ciphertexts are **NTT+Montgomery resident** exactly like CKKS — so
  add/sub/plain-mult/relinearize/rotate reuse the CKKS evaluator verbatim
  (rotate_rows = galois element 5^k, rotate_columns = conjugation element,
  sharing keys and kernels).  Only multiply and decrypt round-trip through
  the coefficient domain.
* Multiply is the HPS RNS variant: lift to an auxiliary basis B with
  |B| = |Q|+2 extra 30-bit primes (covers the t·N·Q/2 bound), tensor in
  both bases on-device, scale by t/Q via two exact fast base conversions
  (float64 α-correction — exact for centered inputs, the standard HPS
  trick), land back in Q.
* Exactness is unit-tested against big-integer reference math
  (tests/test_bfv.py) — the check SEAL gets from its own nature.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from . import galois, nt, random as rnd
from .ciphertext import Ciphertext, Plaintext
from .context import Context
from .encrypt import Encryptor
from .evaluator import Evaluator
from .keys import KeyGenerator
from .modular import (
    mod_add, mod_neg, mod_sub, mont_mul, shoup_mul, shoup_precompute,
    mont_constants,
)
from .ntt import NttTables, build_best_tables, build_tables, ntt_fwd, ntt_fwd_mont, ntt_inv
from .params import HeParams, Scheme


def _col(xs, dt=np.uint32):
    return np.array(xs, dtype=dt).reshape(-1, 1)


from .rns import FbcPlan, fbc_apply, make_fbc  # shared RNS machinery


# ======================================================================
# BFV scheme object
# ======================================================================

class BfvScheme:
    """Per-context BFV machinery layered on the shared Context/Evaluator."""

    def __init__(self, ctx: Context):
        p = ctx.params
        if p.scheme != Scheme.BFV:
            raise ValueError("BfvScheme requires BFV params")
        self.ctx = ctx
        self.t = p.plain_modulus
        n = p.poly_degree
        self.n = n
        Q_primes = list(p.moduli)
        L = len(Q_primes)
        # auxiliary basis B: L+2 fresh 30-bit NTT primes (covers t·N·Q/2)
        used = set(Q_primes) | set(p.special_moduli) | {self.t}
        cand = nt.gen_primes(30, L + 2 + len(used) + 4, 2 * n)
        B_primes = [q for q in cand if q not in used][: L + 2]
        self.B_primes = B_primes
        self.tables_B = build_best_tables(n, B_primes)
        self.mont_B = mont_constants(B_primes)
        self.tables_t = build_tables(n, (self.t,))
        # Δ = floor(Q/t) mod q_i
        Q = 1
        for q in Q_primes:
            Q *= q
        self.Q = Q
        delta = Q // self.t
        self.delta_mod_q = _col([delta % q for q in Q_primes])
        self.delta_shoup = shoup_precompute(self.delta_mod_q, _col(Q_primes))
        # t mod each prime of Q∪B, and Q^{-1} mod b_j
        QB = Q_primes + B_primes
        self.t_mod_qb = _col([self.t % r for r in QB])
        self.t_shoup_qb = shoup_precompute(self.t_mod_qb, _col(QB))
        self.qinv_mod_b = _col([nt.modinv(Q % b, b) for b in B_primes])
        self.qinv_shoup_b = shoup_precompute(self.qinv_mod_b, _col(B_primes))
        # base-conversion plans
        self.fbc_q_to_b = make_fbc(Q_primes, B_primes)
        self.fbc_b_to_q = make_fbc(B_primes, Q_primes)
        # slot layout: slot (row r, col c) ↔ exponent ±5^c (SEAL batching
        # semantics: elt 5^k rotates rows, conjugation swaps rows)
        half = n // 2
        exp_to_idx = galois._exp_to_index(n)
        slot_to_eval = np.empty(n, dtype=np.int64)
        e = 1
        for c in range(half):
            slot_to_eval[c] = exp_to_idx[e]
            slot_to_eval[half + c] = exp_to_idx[2 * n - e]
            e = e * 5 % (2 * n)
        self.slot_to_eval = slot_to_eval

    # ------------------------------------------------------------------
    # batching encoder (SEAL BatchEncoder parity)
    # ------------------------------------------------------------------

    def encode(self, values, level: int | None = None) -> Plaintext:
        """Integer vector (≤ N values, mod t) → plaintext whose poly is
        ALSO lifted to the Q basis in NTT form for plain ops."""
        ctx = self.ctx
        if level is None:
            level = ctx.num_data - 1
        v = np.zeros(self.n, dtype=np.int64)
        vals = np.asarray(values, dtype=np.int64).ravel()
        v[: vals.shape[0]] = vals % self.t
        ev = np.zeros(self.n, dtype=np.uint32)
        ev[self.slot_to_eval] = v.astype(np.uint32)
        coeffs_t = np.asarray(ntt_inv(jnp.asarray(ev[None, :]), self.tables_t))[0]
        # centered lift to Q basis (small-norm representative)
        c = coeffs_t.astype(np.int64)
        c = np.where(c > self.t // 2, c - self.t, c)
        res = rnd.signed_to_rns(c, ctx.tables(level).q)
        data = np.asarray(ntt_fwd(jnp.asarray(res), ctx.tables(level)))
        return Plaintext(data=jnp.asarray(data),
                         shoup=jnp.asarray(shoup_precompute(
                             data, ctx.tables(level).q)),
                         level=level, scale=1.0)

    def decode(self, coeffs_mod_t: np.ndarray) -> np.ndarray:
        """Poly coeffs mod t → integer slot values."""
        ev = np.asarray(ntt_fwd(jnp.asarray(coeffs_mod_t[None, :]),
                                self.tables_t))[0]
        return ev[self.slot_to_eval].astype(np.int64)

    # ------------------------------------------------------------------
    # encrypt / decrypt
    # ------------------------------------------------------------------

    def _msg_term(self, pt: Plaintext, level: int) -> jax.Array:
        """Δ·m over Q in NTT+Montgomery (pt.data is the centered lift of m
        in standard NTT form)."""
        tabs = self.ctx.tables(level)
        m_mont = shoup_mul(pt.data, tabs.r, tabs.r_shoup, tabs.q)
        return shoup_mul(m_mont, self.delta_mod_q[: level + 1],
                         self.delta_shoup[: level + 1], tabs.q)

    def encrypt(self, encryptor: Encryptor, pt: Plaintext,
                seed: bytes | None = None) -> Ciphertext:
        """Symmetric/asymmetric RLWE encrypt of Δ·m (SEAL Encryptor BFV
        path).  Reuses the CKKS encryptor with a zero plaintext, then adds
        the scaled message."""
        zero = Plaintext(data=jnp.zeros_like(pt.data),
                         shoup=jnp.zeros_like(pt.data),
                         level=pt.level, scale=1.0)
        ct = (encryptor.encrypt(zero, seed) if encryptor.pk is not None
              else encryptor.encrypt_symmetric(zero, seed))
        q = self.ctx.tables(pt.level).q
        d = ct.data.at[..., 0, :, :].set(
            mod_add(ct.data[..., 0, :, :], self._msg_term(pt, pt.level), q))
        return Ciphertext(data=d, level=pt.level, scale=1.0)

    def decrypt_coeffs_mod_t(self, ct: Ciphertext, sk_data) -> np.ndarray:
        """round(t·x/Q) mod t per coefficient (exact bigint, host)."""
        x = self._raw_decrypt(ct, sk_data)
        centered = self.ctx.crt_lift(x, ct.level)
        Q = self.ctx.q_at(ct.level)
        num = centered.astype(object) * self.t
        m = np.array([(2 * v + Q) // (2 * Q) for v in num], dtype=object)
        return (np.mod(m, self.t)).astype(np.uint64).astype(np.uint32)

    def _raw_decrypt(self, ct: Ciphertext, sk_data) -> np.ndarray:
        mc = self.ctx.mont(ct.level)
        q, qn = mc["q"], mc["qinv_neg"]
        s = sk_data[: ct.level + 1]
        acc = ct.data[..., 0, :, :]
        s_pow = s
        for k in range(1, ct.num_parts):
            acc = mod_add(acc, mont_mul(ct.data[..., k, :, :], s_pow, q, qn), q)
            s_pow = mont_mul(s_pow, s, q, qn)
        return np.asarray(ntt_inv(acc, self.ctx.tables(ct.level),
                                  strip_mont=True))

    def decrypt(self, ct: Ciphertext, sk_data) -> np.ndarray:
        return self.decode(self.decrypt_coeffs_mod_t(ct, sk_data))

    def invariant_noise_budget(self, ct: Ciphertext, sk_data) -> int:
        """Bits of noise headroom: log2(Q/t) − log2(2·|t·x/Q − m|_∞)
        (SEAL Decryptor::invariant_noise_budget — the reference prints it
        around every BFV op)."""
        x = self._raw_decrypt(ct, sk_data)
        centered = self.ctx.crt_lift(x, ct.level)
        Q = self.ctx.q_at(ct.level)
        # noise numerator: |t·x mod Q| centered — the fractional part of
        # t·x/Q scaled by Q
        tx = centered.astype(object) * self.t
        rem = np.array([((v + Q // 2) % Q) - Q // 2 for v in tx], dtype=object)
        worst = max(int(abs(v)) for v in rem)
        if worst == 0:
            return int(Q.bit_length() - self.t.bit_length())
        budget = (Q.bit_length() - 1) - (worst.bit_length() + 1)
        return max(budget, 0)

    # ------------------------------------------------------------------
    # multiply (HPS)
    # ------------------------------------------------------------------

    def multiply(self, a: Ciphertext, b: Ciphertext, ev: Evaluator) -> Ciphertext:
        """BFV ct·ct → 3-part ct.  Tensor over Q∪B, scale by t/Q."""
        if a.level != b.level:
            raise ValueError("level mismatch")
        lvl = a.level
        if lvl != self.ctx.num_data - 1:
            raise NotImplementedError("BFV multiply at dropped levels TBD")
        tabs_q = self.ctx.tables(lvl)
        mc_q = self.ctx.mont(lvl)

        def to_b(ct):
            coeffs = ntt_inv(ct.data, tabs_q, strip_mont=True)
            ext = fbc_apply(coeffs, self.fbc_q_to_b)
            return ntt_fwd_mont(ext, self.tables_B)      # [parts, K, N] Mont

        a_b, b_b = to_b(a), to_b(b)

        def tensor(x, y, q, qn):
            c0, c1 = x[..., 0, :, :], x[..., 1, :, :]
            d0, d1 = y[..., 0, :, :], y[..., 1, :, :]
            t0 = mont_mul(c0, d0, q, qn)
            t2 = mont_mul(c1, d1, q, qn)
            t1 = mod_sub(mod_sub(
                mont_mul(mod_add(c0, c1, q), mod_add(d0, d1, q), q, qn),
                t0, q), t2, q)
            return jnp.stack([t0, t1, t2], axis=-3)

        prod_q = tensor(a.data, b.data, mc_q["q"], mc_q["qinv_neg"])
        prod_b = tensor(a_b, b_b, self.mont_B["q"], self.mont_B["qinv_neg"])

        # coefficient domain, standard form, both bases
        cq = ntt_inv(prod_q, tabs_q, strip_mont=True)
        cb = ntt_inv(prod_b, self.tables_B, strip_mont=True)

        L = lvl + 1
        # u = t·x over Q∪B
        uq = shoup_mul(cq, self.t_mod_qb[:L], self.t_shoup_qb[:L], tabs_q.q)
        ub = shoup_mul(cb, self.t_mod_qb[self.ctx.num_data:],
                       self.t_shoup_qb[self.ctx.num_data:], self.tables_B.q)
        # r = |u|_Q lifted to B; y = (u − r)/Q over B
        r_b = fbc_apply(uq, self.fbc_q_to_b)
        y_b = shoup_mul(mod_sub(ub, r_b, self.tables_B.q),
                        self.qinv_mod_b, self.qinv_shoup_b, self.tables_B.q)
        # back to Q
        out_q = fbc_apply(y_b, self.fbc_b_to_q)
        data = ntt_fwd_mont(out_q, tabs_q)
        return Ciphertext(data=data, level=lvl, scale=1.0)

    # ------------------------------------------------------------------
    # plain ops
    # ------------------------------------------------------------------

    def add_plain(self, ct: Ciphertext, pt: Plaintext, ev: Evaluator):
        q = self.ctx.tables(ct.level).q
        d = ct.data.at[..., 0, :, :].set(
            mod_add(ct.data[..., 0, :, :], self._msg_term(pt, ct.level), q))
        return ct.with_(data=d)

    def sub_plain(self, ct: Ciphertext, pt: Plaintext, ev: Evaluator):
        q = self.ctx.tables(ct.level).q
        d = ct.data.at[..., 0, :, :].set(
            mod_sub(ct.data[..., 0, :, :], self._msg_term(pt, ct.level), q))
        return ct.with_(data=d)

    def multiply_plain(self, ct: Ciphertext, pt: Plaintext, ev: Evaluator):
        """ct × encoded plaintext (centered small-norm poly — no Δ)."""
        q = self.ctx.tables(ct.level).q
        d = shoup_mul(ct.data, pt.data[..., None, :, :],
                      pt.shoup[..., None, :, :], q)
        return ct.with_(data=d)
