"""MXU (systolic-array) four-step NTT: modular matmul via int8 digits.

The butterfly formulation (ntt.py / ntt4.py / pallas_ntt.py) is VPU-bound:
every stage is an elementwise pass with sublane shuffles, ~115 int32 ops
per element per transform, measured ~15-27 us per 16K limb-plane on v5e —
two orders of magnitude off the chip's matmul throughput.  This module
reformulates the four-step decomposition so the size-n1/n2 sub-transforms
run on the MXU instead (SURVEY.md §7 Phase 1 "speed-of-light kernel";
replaces SEAL's ``util::ntt_negacyclic_harvey`` hot path):

    x[n1, n2] --(T1 @ x : MXU)--> twiddle (VPU) --(x @ T2ᵀ : MXU)--> out

Each sub-transform is an exact modular matrix multiply.  TPUs multiply
int8 natively (s8 x s8 -> s32 accumulate), so uint32 residues are split
into FOUR BALANCED base-256 digits (each in [-128, 127], exact over ZZ
after centering the residue to (-q/2, q/2]):

    x  = sum_i xd_i 2^{8i}             (device: ~14 cheap int32 ops)
    T -> digit_j(center(2^{8i} T mod q))   (host-side, exact numpy)

    T @ x mod q = sum_j 2^{8j} G_j,
    G_j = sum_i digit_j(2^{8i} T) @ xd_i   (ONE s8 [4n, 4n] @ [4n, m]
                                            MXU matmul, contracting (i,b))

|G_j| <= 128*128*4n <= 2^23 fits int32; recombination is 4 Shoup
multiplies by 2^{8j} mod q per element (a 2^23 offset keeps operands
unsigned; the offset correction folds into one constant).  Montgomery
bookkeeping is free: matrix entries are standard-form constants, so
Montgomery-form inputs stay Montgomery-form, exactly like Shoup-twiddle
butterflies; the ntt_fwd_mont xR and strip-Mont xR^{-1} epilogues fold
into the LAST stage's recombination constants.

Digit-matrix layouts avoid all in-kernel relayouts:
  left  matrices: rows (j major, a minor)  -> output [4, n1, n2] i32
  right matrices: cols (j major, k minor)  -> output [n1, 4*n2] i32,
                                              lane-sliced per j
Sub-transform matrices are built by running the ntt4 butterfly loops on an
identity matrix in exact numpy-u64 arithmetic — bit-exactness with the
reference kernels is structural, and pinned by tests/test_mxu_ntt.py.

Two device paths: a fused Pallas kernel (whole transform in VMEM, one HBM
read + one write; grid (row-blocks, limbs)) on TPU, and a pure-jnp einsum
path for CPU tests / as the readable reference.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modular import shoup_precompute

_FORCE: bool | None = None        # tests override: enable/disable module
_FORCE_IMPL: str | None = None    # tests override: 'jnp' | 'pallas'

_OFF = np.int32(1 << 23)          # unsigned offset for recombination
_I32 = jnp.int32
_U32 = jnp.uint32


def enabled() -> bool:
    if _FORCE is not None:
        return _FORCE
    env = os.environ.get("HETPU_MXU_NTT")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _use_pallas() -> bool:
    if _FORCE_IMPL is not None:
        return _FORCE_IMPL == "pallas"
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ----------------------------------------------------------------------
# Host-side table construction (exact numpy)
# ----------------------------------------------------------------------

def _fwd_matrix(sub, li: int) -> np.ndarray:
    """Exact matrix of ntt4._fwd_axis2 for limb `li` (u64 numpy replica of
    the butterfly loop applied to the identity): out = T @ x mod q."""
    n = sub.n
    q = np.uint64(sub.primes[li])
    x = np.eye(n, dtype=np.uint64)
    m, half = 1, n // 2
    while m < n:
        x = x.reshape(m, 2, half, n)
        w = sub.fwd_w[li, m: 2 * m].astype(np.uint64).reshape(m, 1, 1)
        u = x[:, 0]
        v = x[:, 1] * w % q
        x = np.stack([(u + v) % q, (u + q - v) % q], axis=1)
        m *= 2
        half //= 2
    return x.reshape(n, n)


def _inv_matrix(sub, li: int, *, n_inv: int) -> np.ndarray:
    """Exact matrix of ntt4._inv_axis2 (GS butterflies + folded n_inv)."""
    n = sub.n
    q = np.uint64(sub.primes[li])
    x = np.eye(n, dtype=np.uint64)
    m, half = n // 2, 1
    while m >= 1:
        x = x.reshape(m, 2, half, n)
        w = sub.inv_w[li, m: 2 * m].astype(np.uint64).reshape(m, 1, 1)
        u = x[:, 0]
        v = x[:, 1]
        s = (u + v) % q
        d = (u + q - v) % q * w % q
        x = np.stack([s, d], axis=1)
        m //= 2
        half *= 2
    return x.reshape(n, n) * np.uint64(n_inv) % q


def _digits_balanced(v: np.ndarray) -> np.ndarray:
    """4 balanced base-256 digits of int64 values |v| < 2^30.
    Returns [..., 4] int8 with v == sum_j d_j 256^j exactly."""
    v = v.astype(np.int64)
    out = np.empty((*v.shape, 4), dtype=np.int8)
    for j in range(3):
        d = ((v + 128) & 255) - 128
        out[..., j] = d.astype(np.int8)
        v = (v - d) >> 8
    assert (np.abs(v) <= 127).all(), "digit overflow"
    out[..., 3] = v.astype(np.int8)
    return out


def _center(m: np.ndarray, q: int) -> np.ndarray:
    m = m.astype(np.int64)
    return np.where(m > q // 2, m - q, m)


def _shifted_digits(T: np.ndarray, q: int) -> np.ndarray:
    """[i, out, in, j] s8 digits of center(2^{8i} T mod q)."""
    shifted = np.stack([T.astype(np.uint64) * np.uint64(1 << (8 * i))
                        % np.uint64(q) for i in range(4)])
    return _digits_balanced(_center(shifted, q))


def _digit_matrix_left(T: np.ndarray, q: int) -> np.ndarray:
    """LEFT-multiply digit matrix: out[a,c] = sum_b T[a,b] x[b,c].
    s8 [(j,a) = 4*n_out, (i,b) = 4*n_in] — j MAJOR in rows so the i32
    output reshapes to [4, n_out, n2] with no relayout."""
    n_out, n_in = T.shape
    d = _shifted_digits(T, q)                                # [i, a, b, j]
    return np.ascontiguousarray(
        d.transpose(3, 1, 0, 2).reshape(4 * n_out, 4 * n_in))


def _digit_matrix_right(T: np.ndarray, q: int) -> np.ndarray:
    """RIGHT-multiply digit matrix: out[a,k] = sum_c z[a,c] T[k,c].
    s8 [(i,c) = 4*n_in, (j,k) = 4*n_out] — j MAJOR in cols so per-j groups
    are aligned 128-lane slices."""
    n_out, n_in = T.shape
    d = _shifted_digits(T, q)                                # [i, k, c, j]
    return np.ascontiguousarray(
        d.transpose(0, 2, 3, 1).reshape(4 * n_in, 4 * n_out))


_KSUM = 0x01010101          # 1 + 2^8 + 2^16 + 2^24 (offset-sum weight)


def _corr_vector(mat: np.ndarray, q: int, kind_left: bool) -> np.ndarray:
    """Per-output correction for UNSIGNED-SHIFTED data digits.

    The device extracts data digits as d_j = ((x >> 8j) & 255) − 128
    (3 parallel ops/digit, no centering, no sequential chain — vs ~19 ops
    for the balanced extraction).  Since x = Σ (d_i + 128)·2^{8i}, each
    digit-matmul accumulator is off by the constant 128·(matrix digit
    sums):  G_true_j = G_meas_j + 128·RS_j[out], so the recombined value
    is  y = S − OFF·K + C[out]  with  C[out] = 128·Σ_j 2^{8j}·RS_j[out].
    C folds into the recombination constants at zero per-element cost.
    Returns C mod q as u32 [n_out]."""
    if kind_left:                     # rows are (j major, out): row sums
        n_out = mat.shape[0] // 4
        rs = mat.astype(np.int64).sum(axis=1).reshape(4, n_out)
    else:                             # cols are (j major, out): col sums
        n_out = mat.shape[1] // 4
        rs = mat.astype(np.int64).sum(axis=0).reshape(4, n_out)
    c = np.zeros(n_out, dtype=np.int64)
    for j in range(4):
        c += rs[j] << (8 * j)
    return ((c * 128) % np.int64(q)).astype(np.uint32)


def _last_consts(primes, extra: int | None, cvec_uniq: np.ndarray,
                 prime_idx: np.ndarray, *, rows_out: bool, per_limb=None):
    """LAST-stage Montgomery-fold constants.  The carry-save pair
    (s_lo, s_hi) is reduced as  u = S·R⁻¹ mod q  (one Montgomery pass),
    then  y·mult = u·W mod q  with ONE Shoup by W = mult·R mod q — one
    fewer Shoup pass than the old two-multiplier fold.  D folds the
    offset sum AND the unsigned-digit correction:
        out = u·W − D[out],   D = mult·(OFF·K − C[out]) mod q.
    Returns (W [L,1], Ws [L,1], D [L,n,1] if rows_out else [L,1,n])."""
    L = len(primes)
    n_out = cvec_uniq.shape[1]
    W = np.zeros((L, 1), dtype=np.uint32)
    D = np.zeros((L, n_out), dtype=np.uint32)
    for li, q in enumerate(primes):
        if extra is None:
            mult = 1
        elif extra == -1:
            mult = pow(1 << 32, -1, q)
        else:
            mult = extra % q
        if per_limb is not None:
            mult = mult * int(per_limb[li]) % q
        W[li, 0] = (mult << 32) % q
        offk = int(_OFF) * _KSUM % q
        c = cvec_uniq[prime_idx[li]].astype(np.int64)
        D[li] = (mult * ((offk - c) % q) % q).astype(np.uint32)
    qcol = np.array([int(p) for p in primes], dtype=np.uint32).reshape(-1, 1)
    D = D.reshape(L, n_out, 1) if rows_out else D.reshape(L, 1, n_out)
    return W, shoup_precompute(W, qcol), D


def _recombine_consts(primes, extra: int | None, per_limb=None):
    """Carry-save epilogue constants: the recombination forms the EXACT
    64-bit integer S = Σ_j 2^{8j}(G_j + OFF) as a (s_lo, s_hi) u32 pair
    (see _carry_save), so  y·mult ≡ c·s_lo + cR·s_hi − corr (mod q)  with
    c = mult, cR = mult·2^32, corr = mult·OFF·0x01010101 — TWO Shoup
    multiplies per element instead of four.  ``extra``/-1/``per_limb``
    fold the Montgomery (±R) and arbitrary per-limb epilogue constants in,
    exactly as before.  Returns (c, c_shoup, cR, cR_shoup, corr), [L, 1]."""
    L = len(primes)
    c = np.zeros((L, 1), dtype=np.uint32)
    cR = np.zeros((L, 1), dtype=np.uint32)
    corr = np.zeros((L, 1), dtype=np.uint32)
    for li, q in enumerate(primes):
        if extra is None:
            mult = 1
        elif extra == -1:                          # R^{-1} mod q
            mult = pow(1 << 32, -1, q)
        else:
            mult = extra % q
        if per_limb is not None:
            mult = mult * int(per_limb[li]) % q
        c[li, 0] = mult % q
        cR[li, 0] = (mult << 32) % q
        corr[li, 0] = mult * int(_OFF) * _KSUM % q
    qcol = np.array([int(p) for p in primes], dtype=np.uint32).reshape(-1, 1)
    return (c, shoup_precompute(c, qcol),
            cR, shoup_precompute(cR, qcol), corr)


def _mid_tables(t_arr: np.ndarray, primes, cvec: np.ndarray,
                cvec_rows: bool):
    """Mid-stage tables fusing the inter-step twiddle multiply INTO the
    Montgomery-fold recombination:  u = S·R⁻¹ mod q (one Montgomery
    pass), then  tw·y = u·W − D  with  W = tw·2^32 mod q and
    D = tw·(OFF·K − C[out]) mod q (C = unsigned-digit correction of the
    FIRST matmul, per its output row/col).  Returns 3 arrays [L, n1, n2]
    — two fewer VMEM tables per limb than the old two-Shoup fold.
    t_arr: [L, n1, n2] standard-form twiddles; cvec: [L, n] corrections
    aligned with t_arr's leading axis, oriented by ``cvec_rows``
    (True: C per first-stage output row a; False: per col k)."""
    L = t_arr.shape[0]
    q3 = np.array([int(p) for p in primes],
                  dtype=np.uint64).reshape(L, 1, 1)
    t64 = t_arr.astype(np.uint64)
    W = ((t64 << np.uint64(32)) % q3).astype(np.uint32)
    offk = np.uint64(int(_OFF) * _KSUM) % q3        # [L,1,1] < q
    c = cvec.astype(np.uint64)
    c = c.reshape(L, -1, 1) if cvec_rows else c.reshape(L, 1, -1)
    oc = (offk + q3 - c % q3) % q3                  # (OFF·K − C) mod q
    D = (t64 * oc % q3).astype(np.uint32)
    q3u = q3.astype(np.uint32)
    return (W, shoup_precompute(W, q3u), D)


_MAT_CACHE: dict = {}


def _prime_matrix(t, li: int, kind: str) -> np.ndarray:
    """Per-prime digit matrix, memoized by (n, prime, kind): the sub-NTT
    psi is a deterministic function of (n, q), so every basis slice of a
    parameter set shares these."""
    q = t.primes[li]
    key = (t.n, q, kind)
    hit = _MAT_CACHE.get(key)
    if hit is None:
        left = kind in ("_w1", "_m1")
        if kind == "_w1":
            mat = _digit_matrix_left(_fwd_matrix(t.sub1, li), q)
        elif kind == "_w2t":
            mat = _digit_matrix_right(_fwd_matrix(t.sub2, li), q)
        elif kind == "_m1":
            mat = _digit_matrix_left(
                _inv_matrix(t.sub1, li, n_inv=int(t.sub1.n_inv[li, 0])), q)
        else:
            mat = _digit_matrix_right(
                _inv_matrix(t.sub2, li, n_inv=int(t.sub2.n_inv[li, 0])), q)
        hit = _MAT_CACHE[key] = (mat, _corr_vector(mat, q, left))
    return hit


class MxuNttTables:
    """Digit matrices + constants for one RNS basis of a FourStepTables.
    All arrays are HOST numpy (device transfer at call sites / jit consts).

    fwd:  y = T1 @ x ; y *= t_fwd ; out = y @ T2^T    (+ xR epilogue opt)
    inv:  y = x @ M2^T ; y *= t_inv ; out = M1 @ y    (+ xR^{-1} opt)
    """

    def __init__(self, t):
        self.n, self.n1, self.n2 = t.n, t.n1, t.n2
        self.primes = t.primes
        L = len(t.primes)
        R = 1 << 32
        self.q_col = np.ascontiguousarray(t.q.reshape(L, 1))
        self.q_half = np.array([q // 2 for q in t.primes],
                               dtype=np.int32).reshape(L, 1)

        # UNIQUE-prime dedup: bases with repeated primes (the per-digit
        # foreign key bases concatenate overlapping prime sets) would
        # otherwise stack one ~1 MB digit matrix PER ROW into the jitted
        # HLO — deep chains blew past the remote-compile payload limit.
        # Matrices/mid-twiddles are per-(n, prime), so store one copy per
        # unique prime and select per-row by index (Pallas: scalar-
        # prefetched block index; jnp: gather only when duplicates exist).
        seen: dict = {}
        rep = []
        idx = np.empty(L, dtype=np.int32)
        for li, q in enumerate(t.primes):
            j = seen.get(q)
            if j is None:
                j = seen[q] = len(rep)
                rep.append(li)
            idx[li] = j
        self.rep_rows = np.asarray(rep, dtype=np.int64)
        self.prime_idx = idx
        self.uniq_primes = tuple(t.primes[int(r)] for r in rep)
        self.has_dups = len(rep) != L

        self._t = t
        # every prime < 2^30 -> kernels may use the 3-multiply
        # approximate-mulhi Shoup (_shoup_fast), still exact
        self.all_small = all(q < (1 << 30) for q in t.primes)
        self.qinv_neg = np.array(
            [(R - pow(q, -1, R)) % R for q in t.primes],
            dtype=np.uint32).reshape(L, 1)
        self._extra_cache: dict = {}

    # Mid-stage twiddle tables (twiddle multiply folded into the
    # Montgomery-fold recombination) — built lazily per direction.
    # The correction vector comes from the direction's FIRST matmul
    # (fwd: left w1, per row a; inv: right m2t, per col k).
    @property
    def mid_fwd(self):
        """Mid tables over UNIQUE primes: 3 × [U, n1, n2]."""
        hit = self.__dict__.get("_mid_fwd")
        if hit is None:
            hit = self.__dict__["_mid_fwd"] = _mid_tables(
                np.asarray(self._t.t_fwd)[self.rep_rows], self.uniq_primes,
                self._cvecs("_w1"), cvec_rows=True)
        return hit

    @property
    def mid_inv(self):
        hit = self.__dict__.get("_mid_inv")
        if hit is None:
            hit = self.__dict__["_mid_inv"] = _mid_tables(
                np.asarray(self._t.t_inv)[self.rep_rows], self.uniq_primes,
                self._cvecs("_m2t"), cvec_rows=False)
        return hit

    # LAST-stage consts: direction-specific (the unsigned-digit correction
    # belongs to the direction's last matmul — fwd: right w2t per col k;
    # inv: left m1 per row a).
    def _last(self, name: str, extra, per_limb=None):
        key = name if per_limb is None else (
            name, np.asarray(per_limb, dtype=np.uint32).tobytes())
        hit = self._extra_cache.get(key)
        if hit is None:
            fwd = name.endswith("fwd") or name == "to_mont"
            hit = self._extra_cache[key] = _last_consts(
                self._t.primes, extra,
                self._cvecs("_w2t" if fwd else "_m1"), self.prime_idx,
                rows_out=not fwd, per_limb=per_limb)
        return hit

    @property
    def plain_fwd(self):
        return self._last("plain_fwd", None)

    @property
    def to_mont(self):            # fwd + xR epilogue
        return self._last("to_mont", 1 << 32)

    @property
    def plain_inv(self):
        return self._last("plain_inv", None)

    @property
    def strip(self):              # inv + xR^{-1} epilogue
        return self._last("strip_inv", -1)

    def strip_extra(self, per_limb: np.ndarray):
        """strip-Montgomery consts with an extra per-limb multiplier
        folded in (cached by value)."""
        return self._last("strip_extra_inv", -1,
                          per_limb=np.asarray(per_limb).reshape(-1))

    # Digit matrices are built LAZILY (a basis used only forward — e.g.
    # the per-digit foreign key bases — never pays for inverse matrices)
    # and memoized per (n, prime, kind) so every level/digit slice of the
    # same parameter set shares one host-side construction.

    def _mats(self, kind: str) -> np.ndarray:
        """Digit matrices over UNIQUE primes: [U, ...] s8."""
        cached = self.__dict__.get(kind)
        if cached is None:
            t = self._t
            pairs = [_prime_matrix(t, int(li), kind) for li in self.rep_rows]
            self.__dict__[kind] = np.stack([p[0] for p in pairs])
            self.__dict__[kind + "c"] = np.stack([p[1] for p in pairs])
            cached = self.__dict__[kind]
        return cached

    def _cvecs(self, kind: str) -> np.ndarray:
        """Unsigned-digit corrections over UNIQUE primes: [U, n_out]."""
        if kind + "c" not in self.__dict__:
            self._mats(kind)
        return self.__dict__[kind + "c"]

    @property
    def w1(self):                 # [L, 4n1, 4n1] s8
        return self._mats("_w1")

    @property
    def w2t(self):                # [L, 4n2, 4n2] s8
        return self._mats("_w2t")

    @property
    def m1(self):
        return self._mats("_m1")

    @property
    def m2t(self):
        return self._mats("_m2t")


_CACHE: dict[int, MxuNttTables] = {}


def tables_for(t) -> MxuNttTables:
    key = id(t)
    hit = _CACHE.get(key)
    if hit is None:
        hit = _CACHE[key] = MxuNttTables(t)
    return hit


# ----------------------------------------------------------------------
# Shared device-side pieces (shape-generic; used by both impls)
# ----------------------------------------------------------------------

def _extract_digit_list(x, q, q_half):
    """u32 residues -> list of 4 balanced-digit arrays (int8), elementwise.
    q, q_half broadcastable against x.  (Legacy path — kept for mxu_fbc
    and probes; the NTT kernels use :func:`_extract_digits`.)"""
    v = x.astype(_I32)
    v = v - jnp.where(v > q_half, q.astype(_I32), jnp.int32(0))
    ds = []
    for _ in range(3):
        d = ((v + 128) & 255) - 128
        ds.append(d.astype(jnp.int8))
        v = (v - d) >> 8
    ds.append(v.astype(jnp.int8))
    return ds


def _extract_digits(x):
    """u32 residues (< 2^31) -> 4 UNSIGNED-SHIFTED int8 digit arrays:
    d_j = ((x >> 8j) & 255) − 128, so x = Σ (d_j + 128)·2^{8j} exactly.
    3 parallel ops per digit, no centering, no sequential chain (the
    balanced extraction costs ~19 dependent ops); the constant −128·…
    bias folds into the recombination constants (see _corr_vector)."""
    ds = []
    for j in range(4):
        t = (x >> (8 * j)).astype(_I32) if j else x.astype(_I32)
        ds.append(((t & 255) - 128).astype(jnp.int8))
    return ds


def _shoup_scalarish(x, w, ws, q):
    """shoup_mul with arbitrary-broadcast operands (x may exceed q)."""
    from .modular import mulhi_u32, mullo_u32
    q_est = mulhi_u32(x, ws)
    r = mullo_u32(x, w) - mullo_u32(q_est, q)
    return jnp.where(r >= q, r - q, r)


def _shoup_fast(x, w, ws, q):
    """Shoup multiply with a 3-multiply APPROXIMATE mulhi:
        q_est = x1·w1 + (x1·w0 >> 16) + (x0·w1 >> 16)
    underestimates the true ⌊x·ws/2^32⌋ by ≤ 2 (three dropped floors),
    so r = x·w − q_est·q ∈ [0, 4q) — two conditional subtracts finish.
    EXACT whenever q < 2^30 (4q < 2^32); one 16×16 partial product and
    its carry chain cheaper than the schoolbook mulhi.  Result is
    bit-identical to _shoup_scalarish (same value mod q, fully reduced).
    """
    from .modular import mullo_u32
    m16 = jnp.uint32(0xFFFF)
    x1 = x >> 16
    x0 = x & m16
    w1 = ws >> 16
    w0 = ws & m16
    q_est = x1 * w1 + ((x1 * w0) >> 16) + ((x0 * w1) >> 16)
    r = mullo_u32(x, w) - mullo_u32(q_est, q)
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return jnp.where(r >= q, r - q, r)


def _carry_save(g_list):
    """Exact u32-pair split of S = Σ_j 2^{8j}·(G_j + OFF):  returns
    (s_lo, s_hi) with S = s_hi·2^32 + s_lo.  G_j are int32 digit-plane
    accumulators with |G_j| ≤ 2^23 (≤ 4n·128² by construction), so
    U_j = G_j + OFF ∈ [0, 2^24] and every shift pair (x<<s, x>>32−s) plus
    carry bits reconstructs the 56-bit sum exactly — pure adds/shifts/
    compares, no multiplies (replaces two of the four Shoup passes the
    old per-digit recombination needed)."""
    u0 = (g_list[0] + _OFF).astype(_U32)
    u1 = (g_list[1] + _OFF).astype(_U32)
    u2 = (g_list[2] + _OFF).astype(_U32)
    u3 = (g_list[3] + _OFF).astype(_U32)
    t1 = u0 + (u1 << 8)
    c1 = (t1 < u0).astype(_U32)
    t2 = t1 + (u2 << 16)
    c2 = (t2 < t1).astype(_U32)
    s_lo = t2 + (u3 << 24)
    c3 = (s_lo < t2).astype(_U32)
    s_hi = (u1 >> 24) + (u2 >> 16) + (u3 >> 8) + c1 + c2 + c3
    return s_lo, s_hi


def _fold_mul(s_lo, s_hi, c, cs, cR, cRs, corr, q):
    """y·mult mod q from a carry-save pair:  c·s_lo + cR·s_hi − corr,
    where (c, cR, corr) fold mult, mult·2^32 and the OFF-sum correction.
    (Legacy two-Shoup fold — kept for mxu_fbc; the NTT kernels use
    :func:`_fold_mont`.)"""
    a = _shoup_scalarish(s_lo, c, cs, q)
    b = _shoup_scalarish(s_hi, cR, cRs, q)
    s = a + b
    s = jnp.where(s >= q, s - q, s)
    return jnp.where(s >= corr, s - corr, s + (q - corr))


def _fold_mont(s_lo, s_hi, W, Ws, D, q, qn, fast: bool = False):
    """y·mult mod q from a carry-save pair via ONE Montgomery reduction
    plus ONE Shoup multiply (vs two Shoups in _fold_mul):
        u = S·R⁻¹ mod q            (m = s_lo·(−q⁻¹); u = s_hi + hi(m·q) + c)
        out = u·W − D (mod q)      (W = mult·R mod q precomputed)
    D folds the OFF-sum AND the unsigned-digit correction
    (_last_consts / _mid_tables).  u < 2^31 + 2^27 — _shoup_scalarish
    is exact for any u32 input.  ``fast`` swaps the final Shoup for the
    3-multiply approximate variant (valid iff every q < 2^30); the REDC
    mulhi must stay exact (its error would not be a multiple of q)."""
    from .modular import mulhi_u32, mullo_u32
    m = mullo_u32(s_lo, qn)
    u = s_hi + mulhi_u32(m, q) + (s_lo != 0).astype(_U32)
    r = (_shoup_fast if fast else _shoup_scalarish)(u, W, Ws, q)
    return jnp.where(r >= D, r - D, r + (q - D))


# ----------------------------------------------------------------------
# Pure-jnp path (CPU tests / readable reference)
# ----------------------------------------------------------------------

def _recombine_jnp(groups, consts, q3, qn3):
    """groups: [..., 4, n1, n2] i32 -> u32 [..., n1, n2].  consts are
    (W, Ws, D) — [L, 1] scalars + oriented D (last stage) or
    [L, n1, n2] tables (mid twiddle)."""
    W, Ws, D = consts
    L = q3.shape[0]
    shape = lambda a: jnp.asarray(a).reshape(L, 1, 1) if a.ndim == 2 \
        else jnp.asarray(a)
    s_lo, s_hi = _carry_save([groups[..., j, :, :] for j in range(4)])
    return _fold_mont(s_lo, s_hi, shape(W), shape(Ws), shape(D), q3, qn3)


def _per_row(mt: MxuNttTables, a):
    """[U, ...] unique-prime table -> per-row view (gather iff dups)."""
    return jnp.asarray(a)[mt.prime_idx] if mt.has_dups else jnp.asarray(a)


def _fwd_jnp(x4, mt: MxuNttTables, consts_last):
    lead = x4.shape[:-3]
    L, n1, n2 = x4.shape[-3:]
    q3 = jnp.asarray(mt.q_col).reshape(L, 1, 1)
    qn3 = jnp.asarray(mt.qinv_neg).reshape(L, 1, 1)
    mid = tuple(_per_row(mt, m) for m in mt.mid_fwd)
    xd = jnp.concatenate(_extract_digits(x4), axis=-2)     # [..., L, 4n1, n2]
    g = jnp.einsum("lkz,...lzc->...lkc", _per_row(mt, mt.w1), xd,
                   preferred_element_type=_I32)
    g = g.reshape(*lead, L, 4, n1, n2)
    y = _recombine_jnp(g, mid, q3, qn3)                    # twiddle folded
    zd = jnp.concatenate(_extract_digits(y), axis=-1)      # [..., L, n1, 4n2]
    g2 = jnp.einsum("...laz,lzw->...law", zd, _per_row(mt, mt.w2t),
                    preferred_element_type=_I32)
    g2 = g2.reshape(*lead, L, n1, 4, n2)
    g2 = jnp.moveaxis(g2, -2, -3)                          # [..., 4, n1, n2]
    return _recombine_jnp(g2, consts_last, q3, qn3)


def _inv_jnp(x4, mt: MxuNttTables, consts_last):
    lead = x4.shape[:-3]
    L, n1, n2 = x4.shape[-3:]
    q3 = jnp.asarray(mt.q_col).reshape(L, 1, 1)
    qn3 = jnp.asarray(mt.qinv_neg).reshape(L, 1, 1)
    mid = tuple(_per_row(mt, m) for m in mt.mid_inv)
    xd = jnp.concatenate(_extract_digits(x4), axis=-1)     # [..., L, n1, 4n2]
    g = jnp.einsum("...laz,lzw->...law", xd, _per_row(mt, mt.m2t),
                   preferred_element_type=_I32)
    g = jnp.moveaxis(g.reshape(*lead, L, n1, 4, n2), -2, -3)
    y = _recombine_jnp(g, mid, q3, qn3)                    # twiddle folded
    zd = jnp.concatenate(_extract_digits(y), axis=-2)      # [..., L, 4n1, n2]
    g2 = jnp.einsum("lkz,...lzc->...lkc", _per_row(mt, mt.m1), zd,
                    preferred_element_type=_I32)
    return _recombine_jnp(g2.reshape(*lead, L, 4, n1, n2), consts_last,
                          q3, qn3)


# ----------------------------------------------------------------------
# Fused Pallas kernel: whole transform in VMEM per (row-block, limb)
# ----------------------------------------------------------------------

def _kernel_body(x, lmat, rmat, mid, last, q, qn,
                 left_first: bool, n1: int, n2: int, fast: bool = False):
    """One [n1, n2] plane.  left_first=True: fwd (T1 @ x, mid recomb with
    folded twiddle, x @ T2^T, last recomb with folded epilogue).  ``mid``
    = 3 vector tables [n1, n2] (VMEM: W, Ws, D), ``last`` = per-limb
    scalars W, Ws (SMEM) + oriented D vector (VMEM); both feed the
    carry-save + Montgomery-fold recombination (_fold_mont)."""
    def extract_rows(y):                       # -> [4*n1, n2] (i major)
        return jnp.concatenate(_extract_digits(y), axis=0)

    def extract_cols(y):                       # -> [n1, 4*n2] (i major)
        return jnp.concatenate(_extract_digits(y), axis=1)

    def recomb_rows(g, consts):                # g [4*n1, n2] i32
        s_lo, s_hi = _carry_save([g[j * n1:(j + 1) * n1] for j in range(4)])
        return _fold_mont(s_lo, s_hi, *consts, q, qn, fast)

    def recomb_cols(g, consts):                # g [n1, 4*n2] i32
        s_lo, s_hi = _carry_save(
            [g[:, j * n2:(j + 1) * n2] for j in range(4)])
        return _fold_mont(s_lo, s_hi, *consts, q, qn, fast)

    if left_first:
        g = jax.lax.dot_general(lmat, extract_rows(x), (((1,), (0,)), ((), ())),
                                preferred_element_type=_I32)
        y = recomb_rows(g, mid)
        g2 = jax.lax.dot_general(extract_cols(y), rmat, (((1,), (0,)), ((), ())),
                                 preferred_element_type=_I32)
        return recomb_cols(g2, last)
    g = jax.lax.dot_general(extract_cols(x), rmat, (((1,), (0,)), ((), ())),
                            preferred_element_type=_I32)
    y = recomb_cols(g, mid)
    g2 = jax.lax.dot_general(lmat, extract_rows(y), (((1,), (0,)), ((), ())),
                             preferred_element_type=_I32)
    return recomb_rows(g2, last)


def _row_block(rows: int) -> int:
    """Rows per grid step.  Smaller blocks = more grid steps per limb =
    deeper Mosaic double-buffering of the x/out DMAs; bigger blocks
    amortize table reuse.  HETPU_NTT_RB overrides for sweeps."""
    pref = os.environ.get("HETPU_NTT_RB")
    # measured on v5e (N=2^14, B=8): rb=4 wins a STANDALONE NTT
    # microbench by ~16% (double-buffered x/out DMAs) but loses
    # ~1% inside the fused mult+relin+rescale program, where
    # adjacent pallas calls already overlap — keep 8 first
    order = (8, 4, 2, 1)
    if pref:
        try:
            rb = int(pref)
            if rb > 0:
                order = (rb,)
        except ValueError:
            pass               # bad env value: fall back to the default
    for rb in order:
        if rows % rb == 0:
            return rb
    return 1


# NOTE (measured, v5e): batching the rb rows of a block into one matmul
# pair (rows along the free dim) is 0.37x SLOWER than this per-row loop —
# the int8 [rb,4,n1,n2] transposes it needs dominate, and Mosaic cannot
# lay out some of them at all.  The sequential per-row loop is the fast
# shape; don't resurrect the "fused rows" idea without re-measuring.
@lru_cache(maxsize=None)
def _pallas_call(n1: int, n2: int, L: int, rows: int, left_first: bool,
                 fast: bool = False):
    rb = _row_block(rows)

    def kernel(idx_ref, x_ref, lm_ref, rm_ref,
               m0_ref, m1_ref, m2_ref, dl_ref,
               q_ref, qn_ref, w_ref, ws_ref,
               out_ref):
        l = pl.program_id(0)
        # per-row consts are 1-D [L] SMEM arrays: a [L, 1] shape would be
        # lane-padded x128 and blow the 1 MB SMEM at deep-chain row
        # counts (seen at L=361: 7 x 184 KB > SMEM)
        q = q_ref[l]
        qn = qn_ref[l]
        mid = (m0_ref[0], m1_ref[0], m2_ref[0])
        last = (w_ref[l], ws_ref[l], dl_ref[0])
        for p in range(rb):
            out_ref[p, 0] = _kernel_body(
                x_ref[p, 0], lm_ref[0], rm_ref[0], mid, last,
                q, qn, left_first, n1, n2, fast)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    # grid is (limb, row-block) — rows INNERMOST, so the per-limb digit
    # matrices and mid twiddle tables are DMA'd once per limb and reused
    # across every row block.  Tables are stored per UNIQUE prime; the
    # scalar-prefetched idx picks the block for row l (bases with
    # repeated primes — per-digit foreign key bases — share one copy).
    by_uniq = lambda shape: pl.BlockSpec(
        (1, *shape), lambda l, r, idx: (idx[l],) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    def call(x4, prime_idx, lm, rm, mid, q, qn, last):
        W, Ws, Dlast = last
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, rows // rb),
            in_specs=[
                pl.BlockSpec((rb, 1, n1, n2),
                             lambda l, r, idx: (r, l, 0, 0),
                             memory_space=pltpu.VMEM),
                by_uniq(lm.shape[1:]), by_uniq(rm.shape[1:]),
                by_uniq((n1, n2)), by_uniq((n1, n2)), by_uniq((n1, n2)),
                # last-stage D: per-LIMB oriented vector [1, n] / [n, 1]
                pl.BlockSpec((1, *Dlast.shape[1:]),
                             lambda l, r, idx: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                smem(), smem(), smem(), smem(),
            ],
            out_specs=pl.BlockSpec((rb, 1, n1, n2),
                                   lambda l, r, idx: (r, l, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        flat = lambda a: np.asarray(a).reshape(-1)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, L, n1, n2), jnp.uint32),
            # both grid dims are independent (per-limb, per-row-block):
            # telling Mosaic lets it pipeline DMAs across steps freely
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(prime_idx, x4, lm, rm, *mid, Dlast,
          flat(q), flat(qn), flat(W), flat(Ws))
        return out

    return call


def _fast_ok(mt: MxuNttTables) -> bool:
    return (mt.all_small
            and os.environ.get("HETPU_FAST_MULHI", "1") not in ("0",))


def _run_pallas(a, mt: MxuNttTables, *, forward: bool, consts_last):
    lead = a.shape[:-2]
    L = a.shape[-2]
    rows = int(np.prod(lead)) if lead else 1
    x4 = a.reshape(rows, L, mt.n1, mt.n2)
    if forward:
        lm, rm, mid = mt.w1, mt.w2t, mt.mid_fwd
    else:
        lm, rm, mid = mt.m1, mt.m2t, mt.mid_inv
    call = _pallas_call(mt.n1, mt.n2, L, rows, forward, _fast_ok(mt))
    out = call(x4, jnp.asarray(mt.prime_idx), lm, rm, mid,
               mt.q_col, mt.qinv_neg, consts_last)
    return out.reshape(*lead, L, mt.n)


# ----------------------------------------------------------------------
# Public API (bit-exact drop-ins for ntt4.ntt_fwd / ntt_inv)
# ----------------------------------------------------------------------

def ntt_fwd(a, t, *, to_mont: bool = False):
    """[..., L, N] u32 -> bit-exact equivalent of ntt4.ntt_fwd, optionally
    with the xR Montgomery epilogue folded into the last recombination."""
    mt = tables_for(t)
    consts = mt.to_mont if to_mont else mt.plain_fwd
    if _use_pallas():
        return _run_pallas(a, mt, forward=True, consts_last=consts)
    lead = a.shape[:-2]
    L = a.shape[-2]
    x4 = a.reshape(*lead, L, t.n1, t.n2)
    return _fwd_jnp(x4, mt, consts).reshape(*lead, L, t.n)


@lru_cache(maxsize=None)
def _pallas_call_lift(n1: int, n2: int, F: int, rows: int, A: int,
                      corr: bool = False, fast: bool = False):
    """Fused digit-lift + forward-NTT kernel: out row f =
    NTT_f(Σ_{i<A} shoup(y[dig_f·A + i], lw[f,i]) mod q_f).

    The op is HBM-bandwidth-bound on TPU: computing the key-basis lift
    in the NTT kernel's prologue skips the full write+read of the lifted
    planes (2·F plane passes per keyswitch).  Grid is (row-block, f) with
    f INNERMOST: consecutive f of the same digit share the y block (its
    index map output is unchanged, so Mosaic skips the re-fetch), and a
    digit's y planes are DMA'd once per row-block."""
    rb = _row_block(rows)

    def kernel(idx_ref, dig_ref, x_ref, lm_ref, rm_ref,
               m0_ref, m1_ref, m2_ref, dl_ref,
               q_ref, qn_ref, w_ref, ws_ref, lw_ref, lws_ref,
               *rest):
        if corr:
            recip_ref, pm_ref, pms_ref, out_ref = rest
        else:
            (out_ref,) = rest
        f = pl.program_id(1)
        q = q_ref[f]
        qn = qn_ref[f]
        mid = (m0_ref[0], m1_ref[0], m2_ref[0])
        last = (w_ref[f], ws_ref[f], dl_ref[0])
        for p in range(rb):
            acc = None
            for i in range(A):
                # zero-padded lw rows make short digits and the OOB tail
                # of the last y block exact (x·0 ≡ 0); lw is flat [F*A]
                # 1-D SMEM (2-D SMEM arrays get lane-padded x128)
                term = (_shoup_fast if fast else _shoup_scalarish)(
                    x_ref[p, i], lw_ref[f * A + i], lws_ref[f * A + i], q)
                if acc is None:
                    acc = term
                else:
                    s = acc + term
                    acc = jnp.where(s >= q, s - q, s)
            if corr:
                # centered FBC: subtract α·(P mod q), α = round(Σ y_i/p_i)
                # in f32 — same math (and same rounding) as
                # rns.fbc_apply(correct=True, precise=False)
                al = None
                for i in range(A):
                    # u32→f32 is unsupported in Mosaic; residues < 2^31
                    # so the i32 hop is value-preserving
                    xf = x_ref[p, i].astype(_I32).astype(jnp.float32)
                    t_ = xf * recip_ref[i]
                    al = t_ if al is None else al + t_
                alpha = jnp.round(al).astype(_I32).astype(_U32)
                ac = (_shoup_fast if fast else _shoup_scalarish)(
                    alpha, pm_ref[f], pms_ref[f], q)
                acc = jnp.where(acc >= ac, acc - ac, acc + (q - ac))
            out_ref[p, 0] = _kernel_body(
                acc, lm_ref[0], rm_ref[0], mid, last, q, qn, True, n1, n2,
                fast)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    by_uniq = lambda shape: pl.BlockSpec(
        (1, *shape), lambda r, f, idx, dig: (idx[f],) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    def call(y4, prime_idx, dig, lm, rm, mid, q, qn, last, lw, lws,
             corr_args=None):
        W, Ws, Dlast = last
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows // rb, F),
            in_specs=[
                pl.BlockSpec((rb, A, n1, n2),
                             lambda r, f, idx, dig: (r, dig[f], 0, 0),
                             memory_space=pltpu.VMEM),
                by_uniq(lm.shape[1:]), by_uniq(rm.shape[1:]),
                by_uniq((n1, n2)), by_uniq((n1, n2)), by_uniq((n1, n2)),
                pl.BlockSpec((1, *Dlast.shape[1:]),
                             lambda r, f, idx, dig: (f, 0, 0),
                             memory_space=pltpu.VMEM),
                smem(), smem(), smem(), smem(), smem(), smem(),
            ] + ([smem(), smem(), smem()] if corr else []),
            out_specs=pl.BlockSpec((rb, 1, n1, n2),
                                   lambda r, f, idx, dig: (r, f, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        flat = lambda a: np.asarray(a).reshape(-1)
        extra = ()
        if corr:
            recip, pmod, pmods = corr_args
            extra = (np.asarray(recip, np.float32).reshape(-1),
                     flat(pmod), flat(pmods))
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, F, n1, n2), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(prime_idx, dig, y4, lm, rm, *mid, Dlast,
          flat(q), flat(qn), flat(W), flat(Ws), flat(lw), flat(lws),
          *extra)

    return call


def ntt_fwd_lifted(y, lift_w, lift_ws, lift_dig, t, *, to_mont=False):
    """Fused digit lift + forward NTT over the concatenated-foreign key
    basis (see _pallas_call_lift):  out[..., f, :] = bit-exact equal to
    ``ntt_fwd(Σ_i shoup(y[..., dig_f·A+i, :], lift_w[f,i]), t)`` row f.
    y: [..., Ly, N] standard-form planes (the decompose INTT output)."""
    mt = tables_for(t)
    consts = mt.to_mont if to_mont else mt.plain_fwd
    F, A = lift_w.shape
    lead = y.shape[:-2]
    Ly = y.shape[-2]
    N = y.shape[-1]
    if _use_pallas():
        rows = int(np.prod(lead)) if lead else 1
        y4 = y.reshape(rows, Ly, mt.n1, mt.n2)
        call = _pallas_call_lift(mt.n1, mt.n2, F, rows, A,
                                 fast=_fast_ok(mt))
        out = call(y4, jnp.asarray(mt.prime_idx),
                   jnp.asarray(np.asarray(lift_dig, dtype=np.int32)),
                   mt.w1, mt.w2t, mt.mid_fwd, mt.q_col, mt.qinv_neg,
                   consts, lift_w, lift_ws)
        return out.reshape(*lead, F, mt.n)
    # jnp path: gather the digit windows, shoup-accumulate, then _fwd_jnp
    from .modular import shoup_mul
    idx = (np.asarray(lift_dig)[:, None] * A
           + np.arange(A)[None, :])                      # [F, A]
    idx = np.minimum(idx, Ly - 1)          # clamped tail: lift_w there = 0
    yg = jnp.take(y, jnp.asarray(idx.reshape(-1)), axis=-2)
    yg = yg.reshape(*lead, F, A, N)
    q = jnp.asarray(mt.q_col)
    acc = None
    for i in range(A):
        term = shoup_mul(yg[..., :, i, :], jnp.asarray(lift_w[:, i: i + 1]),
                         jnp.asarray(lift_ws[:, i: i + 1]), q)
        acc = term if acc is None else mod_add_u32(acc, term, q)
    x4 = acc.reshape(*lead, F, mt.n1, mt.n2)
    return _fwd_jnp(x4, mt, consts).reshape(*lead, F, mt.n)


def mod_add_u32(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def ntt_fwd_fbc(u, fbc, t, *, to_mont: bool = True):
    """Fused centered fast-base-conversion + forward NTT (the key-switch
    mod-down / fused-rescale tail): semantically equal to
    ``ntt_fwd_mont(rns.fbc_apply(u, fbc, correct=True, premul=False), t)``
    but computed inside one kernel — skips the HBM write+read of the
    converted planes (the op is bandwidth-bound).  α uses the same plain
    f32 rounding as fbc_apply(precise=False); an α misround shifts by ±P,
    absorbed as ±1 noise after the divide at every use site (see
    core/rns.py).  u: [..., A, N] source planes already carrying P̂⁻¹."""
    mt = tables_for(t)
    consts = mt.to_mont if to_mont else mt.plain_fwd
    F = len(t.primes)
    A = u.shape[-2]
    lead = u.shape[:-2]
    if _use_pallas():
        rows = int(np.prod(lead)) if lead else 1
        y4 = u.reshape(rows, A, mt.n1, mt.n2)
        call = _pallas_call_lift(mt.n1, mt.n2, F, rows, A, corr=True,
                                 fast=_fast_ok(mt))
        lw = np.ascontiguousarray(fbc.phat_mod_r.T)          # [F, A]
        lws = np.ascontiguousarray(fbc.phat_shoup.T)
        out = call(y4, jnp.asarray(mt.prime_idx),
                   jnp.asarray(np.zeros(F, dtype=np.int32)),
                   mt.w1, mt.w2t, mt.mid_fwd, mt.q_col, mt.qinv_neg,
                   consts, lw, lws,
                   corr_args=(fbc.p_recip, fbc.ptot_mod_r,
                              fbc.ptot_shoup))
        return out.reshape(*lead, F, mt.n)
    from . import rns
    from .ntt import ntt_fwd_mont as _nfm
    r_q = rns.fbc_apply(u, fbc, correct=True, premul=False)
    if to_mont:
        return _nfm(r_q, t)
    lead = r_q.shape[:-2]
    x4 = r_q.reshape(*lead, F, t.n1, t.n2)
    return _fwd_jnp(x4, mt, consts).reshape(*lead, F, t.n)


def ntt_inv(a, t, *, strip_mont: bool = False, extra=None):
    """[..., L, N] u32 -> bit-exact equivalent of ntt4.ntt_inv.  ``extra``
    (requires strip_mont) folds a per-limb constant multiply into the
    epilogue — e.g. key-switch D̂⁻¹ or FBC P̂⁻¹ — saving a full
    elementwise modmul pass over the output."""
    mt = tables_for(t)
    if extra is not None:
        assert strip_mont
        consts = mt.strip_extra(extra)
    else:
        consts = mt.strip if strip_mont else mt.plain_inv
    if _use_pallas():
        return _run_pallas(a, mt, forward=False, consts_last=consts)
    lead = a.shape[:-2]
    L = a.shape[-2]
    x4 = a.reshape(*lead, L, t.n1, t.n2)
    return _inv_jnp(x4, mt, consts).reshape(*lead, L, t.n)
