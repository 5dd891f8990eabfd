"""HE context: device-ready precomputed tables for one parameter set.

Replaces SEAL's ``SEALContext`` + ``context_data`` modulus chain (reference
uses it everywhere; chain walking in ``include/he_util.h:13-21``).  The
context owns, per RNS prime: NTT twiddle tables, Montgomery/Barrett
constants, and per-level key-switch / rescale constants — all as numpy
arrays that JAX closes over (device-put + cached by jit automatically).

Level convention: ``level = ℓ`` means data primes ``q_0..q_ℓ`` are active
(ℓ+1 limbs).  A fresh ciphertext is at ``level = num_levels-1``; rescale /
mod-switch decrement it.  This equals the reference's ``chain_index``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from . import nt
from .modular import mont_constants, shoup_precompute
from .ntt import NttTables, build_best_tables, build_tables
from .params import HeParams, Scheme


def _col(xs, dt=np.uint32) -> np.ndarray:
    return np.array(xs, dtype=dt).reshape(-1, 1)


@dataclass(frozen=True)
class RescalePlan:
    """Constants for dividing-and-rounding a ciphertext by its last active
    prime q_ℓ (CKKS rescale), or by the special prime P (key-switch
    mod-down).  All shapes broadcast against data [..., ℓ(+1), N]."""

    src_tables: NttTables        # the dropped prime (1 limb)
    dst_tables: NttTables        # remaining primes (ℓ limbs)
    half: np.ndarray             # [1,1]  q_src >> 1
    half_mod: np.ndarray         # [ℓ,1]  (q_src>>1) mod q_i
    mu: np.ndarray               # [ℓ,1]  floor(2^32/q_i) for Barrett
    src_inv: np.ndarray          # [ℓ,1]  q_src^{-1} mod q_i
    src_inv_shoup: np.ndarray


@dataclass(frozen=True)
class KeySwitchPlan:
    """Constants for hybrid key-switching at a given level ℓ.

    Digits are per-prime (SEAL's RNS decomposition): digit j of d is
    d mod q_j, lifted to the key basis {q_0..q_ℓ, P}.  The switching key's
    b-component carries (P mod q_j)·s' on limb j only, making the keys
    level-independent (same trick as SEAL ``util/rlwe.cpp``).
    """

    level: int
    num_digits: int              # ℓ+1
    basis_index: np.ndarray      # indices into the full key basis, len ℓ+2
    basis_tables: NttTables      # key basis {q_0..q_ℓ, P}   [ℓ+2, N]
    mu: np.ndarray               # [ℓ+2,1] Barrett floor(2^32/r)
    q: np.ndarray                # [ℓ+2,1]
    qinv_neg: np.ndarray         # [ℓ+2,1] Montgomery -q^{-1} mod 2^32
    moddown: RescalePlan         # divide by P back to {q_0..q_ℓ}


class Context:
    """All precomputed state for a parameter set. Host-side numpy; arrays
    are closed over by jitted evaluator functions (JAX device-puts and
    caches them)."""

    def __init__(self, params: HeParams):
        self.params = params
        n = params.poly_degree
        self.all_primes: tuple[int, ...] = params.moduli + params.special_moduli
        self.num_data = len(params.moduli)
        self.num_special = len(params.special_moduli)
        # one full table set over data + special primes; levels slice it
        self.tables_full = build_best_tables(n, self.all_primes)
        self.mont_full = mont_constants(self.all_primes)

    # ------------------------------------------------------------------
    # Per-level views (cached)
    # ------------------------------------------------------------------

    @lru_cache(maxsize=None)
    def tables(self, level: int) -> NttTables:
        """NTT tables for active data primes q_0..q_level."""
        return self.tables_full.slice(np.arange(level + 1))

    @lru_cache(maxsize=None)
    def mont(self, level: int) -> dict:
        idx = np.arange(level + 1)
        return {k: np.ascontiguousarray(v[idx]) for k, v in self.mont_full.items()}

    @lru_cache(maxsize=None)
    def rescale_plan(self, level: int) -> RescalePlan:
        """Divide-and-round by q_level, landing on level-1."""
        if level < 1:
            raise ValueError("cannot rescale below level 0")
        src = self.params.moduli[level]
        dst = self.params.moduli[: level]
        return self._make_rescale(src_idx=level, dst_idx=np.arange(level),
                                  src_prime=src, dst_primes=dst)

    def _make_rescale(self, src_idx, dst_idx, src_prime, dst_primes) -> RescalePlan:
        half = src_prime >> 1
        return RescalePlan(
            src_tables=self.tables_full.slice(np.array([src_idx])),
            dst_tables=self.tables_full.slice(dst_idx),
            half=_col([half]),
            half_mod=_col([half % q for q in dst_primes]),
            mu=_col([(1 << 32) // q for q in dst_primes]),
            src_inv=_col([nt.modinv(src_prime % q, q) for q in dst_primes]),
            src_inv_shoup=shoup_precompute(
                _col([nt.modinv(src_prime % q, q) for q in dst_primes]),
                _col(dst_primes),
            ),
        )

    @lru_cache(maxsize=None)
    def keyswitch_plan(self, level: int) -> KeySwitchPlan:
        """Hybrid key-switch constants at level ℓ (single special prime)."""
        if self.num_special != 1:
            raise NotImplementedError("key-switching assumes one special prime")
        p_idx = len(self.all_primes) - 1
        p = self.all_primes[p_idx]
        basis_index = np.concatenate([np.arange(level + 1), [p_idx]])
        basis_primes = [self.all_primes[i] for i in basis_index]
        moddown = self._make_rescale(
            src_idx=p_idx,
            dst_idx=np.arange(level + 1),
            src_prime=p,
            dst_primes=self.params.moduli[: level + 1],
        )
        return KeySwitchPlan(
            level=level,
            num_digits=level + 1,
            basis_index=basis_index,
            basis_tables=self.tables_full.slice(basis_index),
            mu=_col([(1 << 32) // r for r in basis_primes]),
            q=_col(basis_primes),
            qinv_neg=_col([((1 << 32) - nt.modinv(r, 1 << 32)) % (1 << 32)
                           for r in basis_primes]),
            moddown=moddown,
        )

    # ------------------------------------------------------------------
    # Exact CRT helpers (host side, Python ints)
    # ------------------------------------------------------------------

    def q_at(self, level: int) -> int:
        x = 1
        for q in self.params.moduli[: level + 1]:
            x *= q
        return x

    def crt_lift(self, residues: np.ndarray, level: int) -> np.ndarray:
        """[ℓ+1, N] uint32 standard-form residues → object array of centered
        Python ints in (-Q/2, Q/2]."""
        primes = self.params.moduli[: level + 1]
        Q = self.q_at(level)
        acc = np.zeros(residues.shape[-1], dtype=object)
        for i, q in enumerate(primes):
            qhat = Q // q
            coef = qhat * nt.modinv(qhat % q, q) % Q
            acc = (acc + residues[i].astype(object) * coef) % Q
        return np.where(acc > Q // 2, acc - Q, acc)

    def to_rns(self, coeffs: np.ndarray, level: int) -> np.ndarray:
        """Object/int array of (possibly negative) ints → [ℓ+1, N] uint32."""
        primes = self.params.moduli[: level + 1]
        out = np.empty((len(primes), coeffs.shape[-1]), dtype=np.uint32)
        c = coeffs.astype(object)
        for i, q in enumerate(primes):
            out[i] = (c % q).astype(np.uint64).astype(np.uint32)
        return out
