"""MXU fast base conversion: RNS base switch as an int8 digit matmul.

``rns.fbc_apply`` and the key-switch digit lift in ``evaluator._decompose``
are contractions over the (small) source-limb axis with CONSTANT integer
coefficient matrices:

    out[f] = sum_i y_i * C[i, f]   (mod q_f)      [- alpha * P mod q_f]

The shoup-loop formulation costs S x F elementwise modmuls per output
batch (6 int32 multiplies each) on the VPU.  Here the contraction runs on
the MXU instead, with the same balanced-base-256 digit scheme as
core/mxu_ntt.py:

  * y_i is CENTERED to (-q_i/2, q_i/2] and split into 4 exact int8 digits
    (the center shifts the lifted value by a multiple of the source
    product, absorbed either by the alpha correction - computed from the
    same centered values - or as standard key-switch mod-up noise);
  * the host matrix M[(j2,f),(j1,i)] = digit_j2(center(2^{8 j1} C[i,f]
    mod q_f)) makes ONE s8 x s8 -> s32 matmul [4F, 4S(+1)] @ [4S(+1), N]
    compute every output digit group G_j2 exactly
    (|G| <= 128*128*(4S+1) < 2^23, the mxu_ntt carry-save bound);
  * the data-dependent alpha = round(sum v_i / p_i) (|alpha| <= S/2 + 1,
    an exact int8) rides the SAME matmul as one extra contraction row
    whose matrix column holds the digits of (-P mod q_f);
  * recombination is the shared carry-save epilogue (2 Shoup multiplies
    per element instead of S x 6), optionally folding a per-limb constant.

Digit-row layout is j1-major / source-minor (row j1*S + i), so the device
side builds the rhs by simple concatenation of the 4 digit planes - no
sublane interleave.  Output digit groups are padded to 8-sublane
boundaries (row j2*Fp + f) so the carry-save group slices stay aligned.

Two device paths: a fused Pallas kernel (extract + matmul + recombine in
VMEM, grid over batch rows) on TPU, and a pure-jnp path for CPU tests.
Exactness: identical to rns.fbc_apply up to the alpha rounding rule, which
uses the same f32 estimate on centered values.  Pinned against bigint
reference math in tests/test_mxu_fbc.py.

STATUS — documented experiment, OFF by default (``HETPU_MXU_FBC=1``
enables).  Measured on v5e at the bench_n14 shapes: 12% SLOWER than the
VPU shoup loop — the contraction K = 4S+1 ≈ 25 underfills the 128-wide
MXU, and the digit extract/recombine VPU overhead exceeds the saved MACs.
Kept (tested, bit-pinned) because the break-even flips for LARGER source
bases: K grows with the limb count, so very deep chains or multi-special
digit lifts may favor it — re-measure before enabling in production.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu_ntt import (
    _carry_save, _digits_balanced, _fold_mul, _recombine_consts, _row_block,
    _use_pallas,
)

_I32 = jnp.int32


def enabled() -> bool:
    """Evaluator-integration switch (A/B tuning; default OFF).

    Measured on v5e at the bench_n14 config (round 3): the fused-op bench
    runs 9,382 ops/s with the VPU shoup-loop FBC vs 8,262 ops/s with this
    MXU path — the FBC contraction (K ≈ 4·S+1 ≈ 25) utilizes < 20% of the
    128-wide MXU K-dim while paying the digit-extract/recombine epilogues.
    The kernel stays available (HETPU_MXU_FBC=1) for configs with larger
    source bases where the contraction fills the MXU."""
    return os.environ.get("HETPU_MXU_FBC", "0") not in ("0", "false", "off")


def _center_host(m: np.ndarray, q: int) -> np.ndarray:
    m = m.astype(np.int64)
    return np.where(m > q // 2, m - q, m)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


class MxuFbcPlan:
    """Digit matmul form of out[f] = sum_i y_i C[i,f] (- alpha P) mod q_f.

    C: [S, F] uint (entries already reduced mod the respective q_f).
    alpha_coeff: None, or [F] uint holding (P mod q_f) - the alpha row
    carries its NEGATION so out = sum - alpha*P.
    extra: optional per-dst-limb constant multiplier folded into the
    recombination (e.g. (P q_l)^{-1} for a fused mod-down).
    """

    def __init__(self, src_primes, dst_primes, C: np.ndarray,
                 alpha_coeff=None, extra=None):
        S, F = C.shape
        assert len(src_primes) == S and len(dst_primes) == F
        self.S, self.F = S, F
        self.Fp = Fp = _pad8(F)
        self.has_alpha = alpha_coeff is not None
        K = 4 * S + (1 if self.has_alpha else 0)
        self.K = K
        # contraction dim padded to the s8 sublane tile (32) so the rhs
        # digit stack needs no in-kernel masking/relayout
        self.Kp = Kp = -(-K // 32) * 32
        assert K <= 511, "carry-save bound: 128*128*K < 2^23"
        # M rows (j2 major, f minor, groups padded to Fp); cols j1*S + i
        M = np.zeros((4, Fp, Kp), dtype=np.int8)
        for f, qf in enumerate(dst_primes):
            shifted = np.stack(
                [np.asarray(C[:, f], dtype=np.uint64)
                 * np.uint64(1 << (8 * j1)) % np.uint64(qf)
                 for j1 in range(4)])                          # [j1, S]
            d = _digits_balanced(_center_host(shifted, qf))    # [j1, S, j2]
            M[:, f, : 4 * S] = d.transpose(2, 0, 1).reshape(4, 4 * S)
            if self.has_alpha:
                da = _digits_balanced(_center_host(np.array(
                    [(int(qf) - int(alpha_coeff[f]) % int(qf)) % int(qf)],
                    dtype=np.uint64), qf))[0]                  # [4]
                M[:, f, 4 * S] = da
        self.M = np.ascontiguousarray(M.reshape(4 * Fp, Kp))
        self.q_col = np.array([int(q) for q in src_primes],
                              dtype=np.uint32).reshape(S, 1)
        self.q_half = np.array([int(q) // 2 for q in src_primes],
                               dtype=np.int32).reshape(S, 1)
        self.recip = (1.0 / self.q_col.astype(np.float64)).astype(np.float32)
        consts = _recombine_consts(
            [int(q) for q in dst_primes], None,
            per_limb=None if extra is None else np.asarray(extra).reshape(-1))
        padf = lambda a, fill=0: np.concatenate(
            [a, np.full((Fp - F, 1), fill, a.dtype)]) if Fp != F else a
        self.consts = tuple(padf(c) for c in consts)
        dq = np.array([int(q) for q in dst_primes],
                      dtype=np.uint32).reshape(F, 1)
        # padding limbs get q=1 (c=0) so the recombination math stays in
        # range; their rows are sliced away before returning
        self.dst_q = padf(dq, fill=1)
        self._call_cache: dict = {}

    # ------------------------------------------------------------------

    def _digits_and_alpha(self, y, q3, qh3, lead, N):
        """Shared extract: y [..., S, N] u32 -> s8 [..., Kp, N] rhs."""
        S = self.S
        v = y.astype(_I32)
        v = v - jnp.where(v > qh3, q3.astype(_I32), jnp.int32(0))
        ds = []
        vv = v
        for _ in range(3):
            d = ((vv + 128) & 255) - 128
            ds.append(d.astype(jnp.int8))
            vv = (vv - d) >> 8
        ds.append(vv.astype(jnp.int8))
        rows = ds                                   # j1-major [.., S, N] x4
        if self.has_alpha:
            alpha = jnp.round(jnp.sum(
                v.astype(jnp.float32) * jnp.asarray(self.recip),
                axis=-2, keepdims=True)).astype(_I32)
            rows = rows + [alpha.astype(jnp.int8)]
        if self.Kp != self.K:
            rows = rows + [jnp.zeros((*lead, self.Kp - self.K, N), jnp.int8)]
        return jnp.concatenate(rows, axis=-2)

    def _recombine(self, G, lead, N):
        """G [..., 4*Fp, N] i32 -> u32 [..., F, N]."""
        Fp = self.Fp
        c, cs, cR, cRs, corr = self.consts
        sh = lambda a: jnp.asarray(a)
        s_lo, s_hi = _carry_save(
            [G[..., j * Fp:(j + 1) * Fp, :] for j in range(4)])
        out = _fold_mul(s_lo, s_hi, sh(c), sh(cs), sh(cR), sh(cRs),
                        sh(corr), jnp.asarray(self.dst_q))
        return out[..., : self.F, :]

    def apply(self, y: jax.Array) -> jax.Array:
        """y: [..., S, N] u32 standard-form residues -> [..., F, N] u32."""
        if _use_pallas():
            return self._apply_pallas(y)
        lead = y.shape[:-2]
        N = y.shape[-1]
        yd = self._digits_and_alpha(y, jnp.asarray(self.q_col),
                                    jnp.asarray(self.q_half), lead, N)
        # i32 dot on the CPU/jnp path: XLA:CPU miscompiles fused s8 dots
        # ("add i32, i8" invalid IR); values are identical, and the TPU
        # path (_apply_pallas) keeps the native s8 MXU form
        G = jax.lax.dot_general(
            jnp.asarray(self.M).astype(_I32), yd.astype(_I32),
            (((1,), (yd.ndim - 2,)), ((), ())),
            preferred_element_type=_I32)            # [4Fp, ..., N]
        G = jnp.moveaxis(G, 0, -2)
        return self._recombine(G, lead, N)

    # ------------------------------------------------------------------
    # Fused Pallas path
    # ------------------------------------------------------------------

    def _apply_pallas(self, y: jax.Array) -> jax.Array:
        lead = y.shape[:-2]
        S, N = y.shape[-2:]
        rows = int(np.prod(lead)) if lead else 1
        call = _pallas_call(self, rows, N)
        out = call(y.reshape(rows, S, N), jnp.asarray(self.M),
                   jnp.asarray(self.q_col), jnp.asarray(self.q_half),
                   jnp.asarray(self.recip),
                   *(jnp.asarray(c) for c in self.consts),
                   jnp.asarray(self.dst_q))
        return out.reshape(*lead, self.F, N)


def _build_pallas_call(plan, rows, N):
    # rb capped at 2: per-row temporaries (digit stack + [4Fp, N] i32
    # accumulator) are VMEM-hungry; big input/output blocks OOM the 16M
    # scoped vmem at N=2^14
    rb = min(_row_block(rows), 2)
    S, F, Fp, Kp = plan.S, plan.F, plan.Fp, plan.Kp

    def kernel(y_ref, m_ref, q_ref, qh_ref, recip_ref,
               c_ref, cs_ref, cR_ref, cRs_ref, corr_ref, dq_ref, out_ref):
        for p in range(rb):
            y = y_ref[p]                               # [S, N]
            v = y.astype(_I32)
            v = v - jnp.where(v > qh_ref[...], q_ref[...].astype(_I32),
                              jnp.int32(0))
            ds = []
            vv = v
            for _ in range(3):
                d = ((vv + 128) & 255) - 128
                ds.append(d.astype(jnp.int8))
                vv = (vv - d) >> 8
            ds.append(vv.astype(jnp.int8))
            if plan.has_alpha:
                alpha = jnp.round(jnp.sum(
                    v.astype(jnp.float32) * recip_ref[...],
                    axis=0, keepdims=True)).astype(_I32)
                ds.append(alpha.astype(jnp.int8))
            pad = Kp - 4 * S - (1 if plan.has_alpha else 0)
            if pad:
                ds.append(jnp.zeros((pad, y.shape[-1]), jnp.int8))
            yd = jnp.concatenate(ds, axis=0)           # [Kp, N]
            G = jax.lax.dot_general(
                m_ref[...], yd, (((1,), (0,)), ((), ())),
                preferred_element_type=_I32)           # [4Fp, N]
            s_lo, s_hi = _carry_save(
                [G[j * Fp:(j + 1) * Fp] for j in range(4)])
            out = _fold_mul(s_lo, s_hi, c_ref[...], cs_ref[...],
                            cR_ref[...], cRs_ref[...], corr_ref[...],
                            dq_ref[...])
            out_ref[p] = out[:F]

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def call(y, m, q, qh, recip, c, cs, cR, cRs, corr, dq):
        return pl.pallas_call(
            kernel,
            grid=(rows // rb,),
            in_specs=[
                pl.BlockSpec((rb, S, N), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                vmem(), vmem(), vmem(), vmem(),
                vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
            ],
            out_specs=pl.BlockSpec((rb, F, N), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, F, N), jnp.uint32),
        )(y, m, q, qh, recip, c, cs, cR, cRs, corr, dq)

    return call


def _pallas_call(plan: MxuFbcPlan, rows: int, N: int):
    hit = plan._call_cache.get((rows, N))
    if hit is None:
        hit = plan._call_cache[(rows, N)] = _build_pallas_call(plan, rows, N)
    return hit


# ----------------------------------------------------------------------
# Cached plan constructors for the two hot call sites
# ----------------------------------------------------------------------

_PLAN_CACHE: dict = {}


def lift_plan(ks_plan, di: int) -> MxuFbcPlan:
    """Key-switch digit lift (evaluator._decompose): digit ``di``'s source
    primes -> its foreign key-basis primes, C = dhat (no alpha: the
    centered-lift excess u*D is standard hybrid mod-up noise)."""
    key = ("lift", id(ks_plan), di)
    hit = _PLAN_CACHE.get(key)
    if hit is None:
        lo, hi = ks_plan.digit_bounds[di]
        foreign = ks_plan.foreign_idx[di]
        src = [int(ks_plan.q[i, 0]) for i in range(lo, hi)]
        dst = [int(ks_plan.q[f, 0]) for f in foreign]
        C = ks_plan.dhat[lo:hi][:, foreign]
        hit = _PLAN_CACHE[key] = MxuFbcPlan(src, dst, C)
    return hit


def fbc_plan(plan, extra=None) -> MxuFbcPlan:
    """MXU form of rns.fbc_apply(..., correct=True, premul=False) for an
    rns.FbcPlan, with an optional folded per-dst-limb constant."""
    key = ("fbc", id(plan),
           None if extra is None else np.asarray(extra).tobytes())
    hit = _PLAN_CACHE.get(key)
    if hit is None:
        src = [int(p) for p in plan.p[:, 0]]
        dst = [int(r) for r in plan.r[:, 0]]
        hit = _PLAN_CACHE[key] = MxuFbcPlan(
            src, dst, plan.phat_mod_r,
            alpha_coeff=[int(x) for x in plan.ptot_mod_r[:, 0]],
            extra=extra)
    return hit
