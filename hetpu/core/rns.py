"""Shared RNS base-conversion machinery (used by BFV multiply and the
generalized hybrid key-switch).

``fbc_apply`` converts residues of CENTERED values between bases with a
float32 α-correction (misround shifts by ±P — absorbed as bounded noise
at every use site; see the analysis in core/bfv.py).  For NON-centered
digit lifts (key-switch mod-up) use ``fbc_apply(..., correct=False)``:
the value lands in [0, k·P), the u·P excess being standard hybrid-
keyswitch noise covered by the special-prime product.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from . import nt
from .modular import mod_add, mod_sub, shoup_mul, shoup_precompute


def _col(xs, dt=np.uint32):
    return np.array(xs, dtype=dt).reshape(-1, 1)


@dataclass(frozen=True)
class FbcPlan:
    """Convert RNS residues over basis P to residues over basis R."""
    inv_punit: np.ndarray        # [(P/p_i)^{-1} mod p_i]          [Lp, 1]
    inv_punit_shoup: np.ndarray
    p: np.ndarray                # source primes                    [Lp, 1]
    p_recip: np.ndarray          # 1/p_i float                      [Lp, 1]
    # two-float split of 2^16/p_i and 1/p_i for the precise α path
    r16_hi: np.ndarray           # f32 hi of 2^16/p_i               [Lp, 1]
    r16_lo: np.ndarray           # f32 residual                     [Lp, 1]
    r0_hi: np.ndarray            # f32 hi of 1/p_i                  [Lp, 1]
    r0_lo: np.ndarray
    phat_mod_r: np.ndarray       # (P/p_i) mod r_j                  [Lp, Lr]
    phat_shoup: np.ndarray
    ptot_mod_r: np.ndarray       # P mod r_j                        [Lr, 1]
    ptot_shoup: np.ndarray
    r: np.ndarray                # target primes                    [Lr, 1]


def _two_float(x: np.ndarray):
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def make_fbc(src_primes, dst_primes) -> FbcPlan:
    P = 1
    for p in src_primes:
        P *= int(p)
    inv_punit = [nt.modinv((P // p) % p, p) for p in src_primes]
    phat = np.array([[(P // p) % r for r in dst_primes] for p in src_primes],
                    dtype=np.uint32)
    rcol = _col(dst_primes)
    pcol_f = _col(src_primes).astype(np.float64)
    r16_hi, r16_lo = _two_float((2.0 ** 16) / pcol_f)
    r0_hi, r0_lo = _two_float(1.0 / pcol_f)
    return FbcPlan(
        inv_punit=_col(inv_punit),
        inv_punit_shoup=shoup_precompute(_col(inv_punit), _col(src_primes)),
        p=_col(src_primes),
        p_recip=(1.0 / pcol_f),
        r16_hi=r16_hi, r16_lo=r16_lo, r0_hi=r0_hi, r0_lo=r0_lo,
        phat_mod_r=phat,
        phat_shoup=np.stack([shoup_precompute(phat[:, j:j + 1], rcol[j:j + 1])
                             [:, 0] for j in range(len(dst_primes))], axis=1),
        ptot_mod_r=_col([P % r for r in dst_primes]),
        ptot_shoup=shoup_precompute(_col([P % r for r in dst_primes]), rcol),
        r=rcol,
    )


def _alpha_precise(y: jax.Array, plan: FbcPlan) -> jax.Array:
    """round(Σ y_i/p_i) with ~2^-40 total error via two-float EFT
    (core/twofloat.py) — the exactness-grade α used by BFV multiply.
    y: [..., Lp, N] standard-form residues.  f32 alone mis-rounds within
    ~Lp·2^-23 of a half-integer; this path shrinks that band below the
    reach of any valid centered input (tests/test_rns.py pins adversarial
    near-half cases)."""
    from .twofloat import ds_add, ds_round, two_prod
    Lp = plan.p.shape[0]
    hi = jnp.zeros(y.shape[:-2] + (1,) + y.shape[-1:], dtype=jnp.float32)
    lo = jnp.zeros_like(hi)
    for i in range(Lp):
        yi = y[..., i:i + 1, :]
        y_top = (yi >> 16).astype(jnp.float32)          # < 2^15, exact
        y_bot = (yi & jnp.uint32(0xFFFF)).astype(jnp.float32)  # exact
        p1, e1 = two_prod(y_top, plan.r16_hi[i, 0].astype(jnp.float32))
        e1 = e1 + y_top * plan.r16_lo[i, 0]
        p0, e0 = two_prod(y_bot, plan.r0_hi[i, 0].astype(jnp.float32))
        e0 = e0 + y_bot * plan.r0_lo[i, 0]
        hi, lo = ds_add(hi, lo, p1, e1)
        hi, lo = ds_add(hi, lo, p0, e0)
    return ds_round(hi, lo).astype(jnp.int32)


def fbc_apply(x: jax.Array, plan: FbcPlan, *, correct: bool = True,
              premul: bool = True, precise: bool = False) -> jax.Array:
    """x: [..., Lp, N] standard-form residues → [..., Lr, N] over the
    target basis.  ``correct=True`` assumes centered values (subtracts
    α·P; see module docstring); ``correct=False`` returns the plain lift
    Σ y_i·(P/p_i) mod r of a value in [0, Lp·P).
    ``premul=False`` means x already carries the P̂⁻¹ factors (e.g. folded
    into an INTT epilogue via ``ntt_inv(..., extra=plan.inv_punit)``).
    ``precise=True`` computes α with two-float EFT (~2^-40 error — the
    BFV-exactness grade); default is plain f32 (error ~Lp·2^-23, a
    possible ±P shift absorbed as ±1 noise after the divide at every
    key-switch use site)."""
    y = shoup_mul(x, plan.inv_punit, plan.inv_punit_shoup,
                  plan.p) if premul else x
    if correct:
        if precise:
            alpha = _alpha_precise(y, plan).astype(jnp.uint32)
        else:
            alpha = jnp.round(jnp.sum(y.astype(jnp.float32) *
                                      plan.p_recip.astype(np.float32),
                                      axis=-2, keepdims=True)).astype(jnp.uint32)
    Lr = plan.r.shape[0]
    outs = []
    for j in range(Lr):
        r = plan.r[j:j + 1]
        acc = jnp.zeros_like(y[..., :1, :])
        for i in range(plan.p.shape[0]):
            term = shoup_mul(y[..., i:i + 1, :], plan.phat_mod_r[i, j],
                             plan.phat_shoup[i, j], r)
            acc = mod_add(acc, term, r)
        if correct:
            corr = shoup_mul(alpha, plan.ptot_mod_r[j], plan.ptot_shoup[j], r)
            acc = mod_sub(acc, corr, r)
        outs.append(acc)
    return jnp.concatenate(outs, axis=-2)
