"""RLWE encryption / decryption.

Replaces SEAL's ``Encryptor``/``Decryptor`` (reference:
``client.cpp:113-115`` — note the reference deliberately uses
``encrypt_symmetric`` to halve ciphertext size on the wire; we reproduce
that with seed-expanded symmetric ciphertexts).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import random as rnd
from .ciphertext import Ciphertext, Plaintext
from .context import Context
from .encoding import CkksEncoder
from .keys import PublicKey, SecretKey
from .modular import mod_add, mod_neg, mont_mul, shoup_mul
from .ntt import ntt_fwd_mont, ntt_inv


def _pt_to_mont(pt: Plaintext, tabs):
    """Standard-form plaintext → Montgomery (for additive use)."""
    return shoup_mul(pt.data, tabs.r, tabs.r_shoup, tabs.q)


class Encryptor:
    """Device math per encryption = ONE jitted call (host sampling feeds
    it) — eager per-op dispatch is ruinous over a remote-device tunnel."""

    def __init__(self, ctx: Context, public_key: PublicKey | None = None,
                 secret_key: SecretKey | None = None):
        if public_key is None and secret_key is None:
            raise ValueError("need a public or secret key")
        self.ctx = ctx
        self.pk = public_key
        self.sk = secret_key
        self._jit_pk: dict[int, object] = {}
        self._jit_sym: dict[int, object] = {}

    # Key material is passed as an ARGUMENT, never closed over: a
    # closed-over jax.Array is baked into the HLO as a constant, so every
    # new key would recompile (and poison the persistent compile cache —
    # 100-300 s per compile over a remote-device relay).
    def _pk_kernel(self, lvl: int):
        fn = self._jit_pk.get(lvl)
        if fn is None:
            ctx = self.ctx
            tabs = ctx.tables(lvl)
            mc = ctx.mont(lvl)
            q, qn = mc["q"], mc["qinv_neg"]

            def kern(u, e0, e1, pt_data, pk):
                u_m = ntt_fwd_mont(u, tabs)
                e0m = ntt_fwd_mont(e0, tabs)
                e1m = ntt_fwd_mont(e1, tabs)
                b, a = pk[0, : lvl + 1], pk[1, : lvl + 1]
                ptm = shoup_mul(pt_data, tabs.r, tabs.r_shoup, tabs.q)
                c0 = mod_add(mod_add(mont_mul(b, u_m, q, qn), e0m, q), ptm, q)
                c1 = mod_add(mont_mul(a, u_m, q, qn), e1m, q)
                return jnp.stack([c0, c1])

            fn = self._jit_pk[lvl] = jax.jit(kern)
        return fn

    def _sym_kernel(self, lvl: int):
        fn = self._jit_sym.get(lvl)
        if fn is None:
            ctx = self.ctx
            tabs = ctx.tables(lvl)
            mc = ctx.mont(lvl)
            q, qn = mc["q"], mc["qinv_neg"]

            def kern(a, e, pt_data, s_full):
                e_m = ntt_fwd_mont(e, tabs)
                s = s_full[: lvl + 1]
                ptm = shoup_mul(pt_data, tabs.r, tabs.r_shoup, tabs.q)
                c0 = mod_add(
                    mod_add(mod_neg(mont_mul(a, s, q, qn), q), e_m, q), ptm, q)
                return jnp.stack([c0, a])

            fn = self._jit_sym[lvl] = jax.jit(kern)
        return fn

    def encrypt(self, pt: Plaintext, seed: bytes | None = None) -> Ciphertext:
        """Public-key encryption: (b·u + e0 + m, a·u + e1)."""
        if self.pk is None:
            return self.encrypt_symmetric(pt, seed)
        ctx = self.ctx
        lvl = pt.level
        n = ctx.params.poly_degree
        tabs = ctx.tables(lvl)
        seed = seed if seed is not None else rnd.new_seed()
        u = rnd.signed_to_rns(rnd.ternary(seed, 1, n), tabs.q)
        e0 = rnd.signed_to_rns(rnd.gaussian(seed, 2, n), tabs.q)
        e1 = rnd.signed_to_rns(rnd.gaussian(seed, 3, n), tabs.q)
        data = self._pk_kernel(lvl)(jnp.asarray(u), jnp.asarray(e0),
                                    jnp.asarray(e1), pt.data, self.pk.data)
        return Ciphertext(data=data, level=lvl, scale=pt.scale)

    def encrypt_symmetric(self, pt: Plaintext,
                          seed: bytes | None = None) -> Ciphertext:
        """Secret-key encryption: (-(a·s) + e + m, a) with `a` expanded from
        a seed — the compact-wire form the reference's client uses."""
        if self.sk is None:
            raise ValueError("symmetric encryption needs the secret key")
        ctx = self.ctx
        lvl = pt.level
        n = ctx.params.poly_degree
        tabs = ctx.tables(lvl)
        seed = seed if seed is not None else rnd.new_seed()
        a = rnd.uniform_rns(seed, 101, tabs.q, n)
        e = rnd.signed_to_rns(rnd.gaussian(seed, 102, n), tabs.q)
        data = self._sym_kernel(lvl)(jnp.asarray(a), jnp.asarray(e), pt.data,
                                     self.sk.data)
        return Ciphertext(data=data, level=lvl, scale=pt.scale)


class Decryptor:
    def __init__(self, ctx: Context, secret_key: SecretKey):
        self.ctx = ctx
        self.sk = secret_key
        self._encoder: CkksEncoder | None = None
        self._jit: dict = {}

    def decrypt_to_coeffs(self, ct: Ciphertext) -> np.ndarray:
        """Σ_k c_k·s^k, INTT'd → standard-form coefficient residues
        [ℓ+1, N] (numpy).  Supports 2- and 3-part ciphertexts."""
        ctx = self.ctx
        lvl = ct.level
        key = (lvl, ct.num_parts)
        fn = self._jit.get(key)
        if fn is None:
            mc = ctx.mont(lvl)
            q, qn = mc["q"], mc["qinv_neg"]
            parts = ct.num_parts

            def kern(data, s_full):
                s = s_full[: lvl + 1]
                acc = data[..., 0, :, :]
                s_pow = s
                for k in range(1, parts):
                    acc = mod_add(acc, mont_mul(data[..., k, :, :], s_pow,
                                                q, qn), q)
                    s_pow = mont_mul(s_pow, s, q, qn)
                return ntt_inv(acc, ctx.tables(lvl), strip_mont=True)

            fn = self._jit[key] = jax.jit(kern)
        return np.asarray(fn(ct.data, self.sk.data))

    def decrypt(self, ct: Ciphertext) -> np.ndarray:
        """Decrypt + CKKS-decode to complex slot values."""
        if self._encoder is None:
            self._encoder = CkksEncoder(self.ctx)
        return self._encoder.decode(self.decrypt_to_coeffs(ct), ct.level, ct.scale)
