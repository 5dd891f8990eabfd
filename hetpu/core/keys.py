"""Key generation: secret, public, relinearization and Galois keys.

Replaces SEAL's ``KeyGenerator`` (reference sites:
``matrix_operations.cpp:764-771``, ``client.cpp:87-92``).

Representation.  All key polynomials are NTT-domain.  Secret/public keys
are Montgomery form; **key-switching keys are stored in R²-form**
(k·R² mod q): the key-switch inner product multiplies a *standard-form*
extended digit by the key with one ``mont_mul``, landing directly in
Montgomery form — the domain conversion is free (see evaluator._keyswitch).

Switching-key structure (hybrid, single special prime P, per-prime RNS
digits — level-independent like SEAL ``util/rlwe.cpp``):
    ksk_j = ( -(a_j·s + e_j) + δ_j·s' ,  a_j )   over basis {q_0..q_{L-1}, P}
with δ_j ≡ P (mod q_j), δ_j ≡ 0 on every other limb.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from . import galois, random as rnd
from .context import Context
from .modular import mod_add, mod_neg, mont_mul, shoup_mul, shoup_precompute
from .ntt import ntt_fwd_mont


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SecretKey:
    data: jax.Array                      # [L_tot, N] Montgomery NTT
    seed: bytes = field(metadata=dict(static=True), default=b"")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PublicKey:
    data: jax.Array                      # [2, L_data, N] Montgomery NTT (b, a)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class KSwitchKey:
    data: jax.Array                      # [J, 2, L_tot, N] R²-form NTT


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RelinKeys:
    key: KSwitchKey


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GaloisKeys:
    elts: tuple = field(metadata=dict(static=True), default=())
    keys: tuple = ()                     # tuple[KSwitchKey] parallel to elts

    def key_for(self, elt: int) -> KSwitchKey:
        try:
            return self.keys[self.elts.index(elt)]
        except ValueError:
            raise KeyError(f"no galois key for element {elt}; "
                           f"have {self.elts}") from None

    def has(self, elt: int) -> bool:
        return elt in self.elts


class KeyGenerator:
    """Samples a fresh secret on construction (like seal::KeyGenerator)."""

    def __init__(self, ctx: Context, seed: bytes | None = None):
        self.ctx = ctx
        self.seed = seed if seed is not None else rnd.new_seed()
        self._domain = 0
        n = ctx.params.poly_degree
        q_all = ctx.tables_full.q
        s = rnd.ternary(self.seed, self._next_domain(), n)
        s_rns = rnd.signed_to_rns(s, q_all)
        self.secret = SecretKey(
            data=ntt_fwd_mont(jnp.asarray(s_rns), ctx.tables_full),
            seed=self.seed,
        )

    def _next_domain(self) -> int:
        self._domain += 1
        return self._domain

    # ------------------------------------------------------------------
    def _rlwe_pair(self, primes_idx: np.ndarray, s_data: jax.Array):
        """Fresh (b, a) with b = -(a·s + e) over the selected prime subset.
        Returns Montgomery-NTT arrays [L_sel, N]."""
        ctx = self.ctx
        n = ctx.params.poly_degree
        tabs = ctx.tables_full.slice(primes_idx)
        a = jnp.asarray(rnd.uniform_rns(self.seed, self._next_domain(), tabs.q, n))
        e = rnd.signed_to_rns(rnd.gaussian(self.seed, self._next_domain(), n), tabs.q)
        e_m = ntt_fwd_mont(jnp.asarray(e), tabs)
        q = tabs.q
        qinv = np.array(
            [((1 << 32) - pow(int(p), -1, 1 << 32)) % (1 << 32) for p in tabs.primes],
            dtype=np.uint32,
        ).reshape(-1, 1)
        b = mod_neg(mod_add(mont_mul(a, s_data, q, qinv), e_m, q), q)
        return b, a

    def create_public_key(self) -> PublicKey:
        ctx = self.ctx
        idx = np.arange(ctx.num_data)
        b, a = self._rlwe_pair(idx, self.secret.data[: ctx.num_data])
        return PublicKey(data=jnp.stack([b, a]))

    # ------------------------------------------------------------------
    def _kswitch_key(self, s_prime: jax.Array) -> KSwitchKey:
        """Switching key for s' → s.  s_prime: [L_tot, N] Montgomery NTT."""
        ctx = self.ctx
        idx_all = np.arange(len(ctx.all_primes))
        tabs = ctx.tables_full
        P = ctx.all_primes[-1]
        rows = []
        for j in range(ctx.num_data):
            b, a = self._rlwe_pair(idx_all, self.secret.data)
            qj = ctx.all_primes[j]
            delta = np.uint32(P % qj)
            delta_shoup = np.uint32((int(delta) << 32) // qj)
            term = shoup_mul(s_prime[j], delta, delta_shoup, np.uint32(qj))
            b = b.at[j].set(mod_add(b[j], term, np.uint32(qj)))
            rows.append(jnp.stack([b, a]))
        k = jnp.stack(rows)                            # [J, 2, L_tot, N] Montgomery
        # → R²-form: one extra Shoup multiply by R (precomputed, one-time)
        return KSwitchKey(data=shoup_mul(k, tabs.r, tabs.r_shoup, tabs.q))

    def create_relin_keys(self) -> RelinKeys:
        ctx = self.ctx
        c = {"q": ctx.tables_full.q,
             "qinv_neg": np.array(
                 [((1 << 32) - pow(int(p), -1, 1 << 32)) % (1 << 32)
                  for p in ctx.all_primes], dtype=np.uint32).reshape(-1, 1)}
        s2 = mont_mul(self.secret.data, self.secret.data, c["q"], c["qinv_neg"])
        return RelinKeys(key=self._kswitch_key(s2))

    def create_galois_keys(self, steps=None) -> GaloisKeys:
        """Keys for slot rotations.  Default: ± all powers of two (SEAL's
        default set — arbitrary steps decompose, evaluator.rotate) plus
        conjugation."""
        ctx = self.ctx
        n = ctx.params.poly_degree
        if steps is None:
            slots = n // 2
            steps = []
            p = 1
            while p < slots:
                steps += [p, -p]
                p *= 2
        elts = []
        for s in steps:
            e = galois.rotation_elt(n, s)
            if e not in elts:
                elts.append(e)
        ce = galois.conjugation_elt(n)
        if ce not in elts:
            elts.append(ce)
        keys = []
        for e in elts:
            s_prime = galois.apply(self.secret.data, n, e)
            keys.append(self._kswitch_key(s_prime))
        return GaloisKeys(elts=tuple(elts), keys=tuple(keys))
