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
    phat_mod_r: np.ndarray       # (P/p_i) mod r_j                  [Lp, Lr]
    phat_shoup: np.ndarray
    ptot_mod_r: np.ndarray       # P mod r_j                        [Lr, 1]
    ptot_shoup: np.ndarray
    r: np.ndarray                # target primes                    [Lr, 1]


def make_fbc(src_primes, dst_primes) -> FbcPlan:
    P = 1
    for p in src_primes:
        P *= int(p)
    inv_punit = [nt.modinv((P // p) % p, p) for p in src_primes]
    phat = np.array([[(P // p) % r for r in dst_primes] for p in src_primes],
                    dtype=np.uint32)
    rcol = _col(dst_primes)
    return FbcPlan(
        inv_punit=_col(inv_punit),
        inv_punit_shoup=shoup_precompute(_col(inv_punit), _col(src_primes)),
        p=_col(src_primes),
        p_recip=(1.0 / _col(src_primes).astype(np.float64)),
        phat_mod_r=phat,
        phat_shoup=np.stack([shoup_precompute(phat[:, j:j + 1], rcol[j:j + 1])
                             [:, 0] for j in range(len(dst_primes))], axis=1),
        ptot_mod_r=_col([P % r for r in dst_primes]),
        ptot_shoup=shoup_precompute(_col([P % r for r in dst_primes]), rcol),
        r=rcol,
    )


def fbc_apply(x: jax.Array, plan: FbcPlan, *, correct: bool = True,
              premul: bool = True) -> jax.Array:
    """x: [..., Lp, N] standard-form residues → [..., Lr, N] over the
    target basis.  ``correct=True`` assumes centered values (subtracts
    α·P, float32 α — see module docstring); ``correct=False`` returns the
    plain lift Σ y_i·(P/p_i) mod r of a value in [0, Lp·P).
    ``premul=False`` means x already carries the P̂⁻¹ factors (e.g. folded
    into an INTT epilogue via ``ntt_inv(..., extra=plan.inv_punit)``)."""
    y = shoup_mul(x, plan.inv_punit, plan.inv_punit_shoup,
                  plan.p) if premul else x
    if correct:
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
