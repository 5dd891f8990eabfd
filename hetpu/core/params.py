"""Encryption parameters (static, hashable — safe to close over under jit).

Replaces SEAL's ``EncryptionParameters`` + ``SEALContext`` parameter layer
(reference call sites: ``src/demos/matrix_operations.cpp:63-66``,
``math_operations.cpp:17-247``, ``fft.cpp:18-21``).

The reference hardcodes 26 modulus ladders by hand
(``math_operations.cpp:21-247``); here chains are generated from
(poly_degree, level count, prime bits) — SURVEY.md §2c explicitly asks for
this parameterization.

TPU-first deviations from SEAL (documented, deliberate):
  * all primes < 2^31 (uint32 lanes; no u64 on TPU) — SEAL's 40/60-bit
    primes become more 30/31-bit primes with the same total modulus budget;
  * hybrid key-switching with one special prime (SEAL's default scheme);
  * default CKKS scale 2^30 paired with ~2^30 rescale primes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum
from functools import cached_property

from . import nt


class Scheme(str, Enum):
    CKKS = "ckks"
    BFV = "bfv"


@dataclass(frozen=True)
class HeParams:
    """Static parameter set. Frozen/hashable: jit-static."""

    scheme: Scheme
    poly_degree: int                       # N, power of two
    moduli: tuple[int, ...]                # RNS primes q_0..q_{L-1} (data primes)
    special_moduli: tuple[int, ...]        # key-switch primes p_0..p_{K-1}
    scale: float = 0.0                     # CKKS default scale (Δ)
    plain_modulus: int = 0                 # BFV t (batching prime) / 0 for CKKS
    sec_level: int = 128

    def __post_init__(self):
        n = self.poly_degree
        if n & (n - 1) or n < 8:
            raise ValueError("poly_degree must be a power of two >= 8")
        for q in self.moduli + self.special_moduli:
            if q >= 1 << 31:
                raise ValueError("primes must be < 2^31 (TPU uint32 lanes)")
            if (q - 1) % (2 * n) != 0:
                raise ValueError(f"prime {q} not NTT-friendly for 2N={2*n}")
            if not nt.is_prime(q):
                raise ValueError(f"{q} is not prime")
        if len(set(self.moduli + self.special_moduli)) != len(self.moduli) + len(
            self.special_moduli
        ):
            raise ValueError("duplicate primes in modulus chain")
        total_bits = sum(q.bit_length() for q in self.moduli + self.special_moduli)
        if self.sec_level and total_bits > nt.max_coeff_modulus_bits(n, self.sec_level):
            raise ValueError(
                f"log2(QP)={total_bits} exceeds {self.sec_level}-bit security bound "
                f"{nt.max_coeff_modulus_bits(n, self.sec_level)} for N={n}; "
                "pass sec_level=0 to override (expert mode)"
            )
        if self.scheme == Scheme.BFV:
            if self.plain_modulus == 0:
                raise ValueError("BFV requires plain_modulus")
            if (self.plain_modulus - 1) % (2 * n) != 0:
                raise ValueError("plain_modulus must support batching (t=1 mod 2N)")

    # ---- derived (host-side) quantities -------------------------------
    @property
    def num_levels(self) -> int:
        """Number of data primes L. chain_index of a fresh ct = L-1 … 0."""
        return len(self.moduli)

    @property
    def slot_count(self) -> int:
        return self.poly_degree // 2 if self.scheme == Scheme.CKKS else self.poly_degree

    @cached_property
    def q_total(self) -> int:
        x = 1
        for q in self.moduli:
            x *= q
        return x

    def q_at_level(self, level: int) -> int:
        """Product of active primes when `level+1` primes remain."""
        x = 1
        for q in self.moduli[: level + 1]:
            x *= q
        return x

    @cached_property
    def p_total(self) -> int:
        x = 1
        for p in self.special_moduli:
            x *= p
        return x

    def log_q(self) -> float:
        return sum(math.log2(q) for q in self.moduli)


# ----------------------------------------------------------------------
# Builders
# ----------------------------------------------------------------------

def ckks_params(
    poly_degree: int,
    levels: int,
    *,
    scale_bits: int = 30,
    first_prime_bits: int = 31,
    special_prime_bits: int = 31,
    num_special: int = 1,
    sec_level: int = 128,
) -> HeParams:
    """CKKS chain: one larger anchor prime + `levels` rescale primes near
    2^scale_bits + special prime(s) for hybrid key-switching.

    Mirrors SEAL's {60, 40...40, 60} idiom (reference
    ``matrix_operations.cpp:845-852``) scaled to 31-bit lanes.
    """
    two_n = 2 * poly_degree
    # rescale primes as close to 2^scale_bits as possible (alternating around
    # the scale keeps rescaled scales stable)
    mid = nt.gen_primes(scale_bits, levels + (first_prime_bits == scale_bits), two_n)
    if first_prime_bits == scale_bits:
        first, mids = mid[0], mid[1:]
        used = set(mid)
    else:
        first = nt.gen_primes(first_prime_bits, 1, two_n)[0]
        mids = mid[:levels]
        used = {first, *mids}
    specials: list[int] = []
    cand = nt.gen_primes(special_prime_bits, num_special + levels + 2, two_n)
    for p in cand:
        if p not in used and len(specials) < num_special:
            specials.append(p)
            used.add(p)
    return HeParams(
        scheme=Scheme.CKKS,
        poly_degree=poly_degree,
        moduli=(first, *mids),
        special_moduli=tuple(specials),
        scale=float(1 << scale_bits),
        sec_level=sec_level,
    )


def bfv_params(
    poly_degree: int,
    levels: int,
    *,
    plain_bits: int = 20,
    prime_bits: int = 30,
    first_prime_bits: int = 31,
    sec_level: int = 128,
) -> HeParams:
    """BFV chain; ``plain_bits`` sized batching plaintext modulus
    (SEAL ``PlainModulus::Batching``, reference ``matrix_operations.cpp:148``)."""
    two_n = 2 * poly_degree
    t = nt.gen_primes(plain_bits, 1, two_n)[0]
    first = nt.gen_primes(first_prime_bits, 1, two_n)[0]
    mids = nt.gen_primes(prime_bits, levels, two_n)[:levels]
    used = {first, *mids}
    special = next(p for p in nt.gen_primes(31, levels + 3, two_n) if p not in used)
    return HeParams(
        scheme=Scheme.BFV,
        poly_degree=poly_degree,
        moduli=(first, *mids),
        special_moduli=(special,),
        plain_modulus=t,
        sec_level=sec_level,
    )


# ----------------------------------------------------------------------
# Named presets mirroring each reference demo's hardcoded parameters
# (SURVEY.md §5 "Config / flag system": the build should have named presets)
# ----------------------------------------------------------------------

def preset(name: str) -> HeParams:
    return _PRESETS[name]()


_PRESETS = {
    # reference matrix_operations.cpp:63-66  — CKKS N=2^13 {60,40,40,60}
    "ckks_small": lambda: ckks_params(1 << 13, levels=2, scale_bits=30,
                                     num_special=2),
    # reference matrix_operations.cpp:840-852 — CKKS N=2^15, 15 levels
    "ckks_deep": lambda: ckks_params(1 << 15, levels=15, scale_bits=30,
                                    num_special=4),
    # reference fft.cpp:18-21 — CKKS N=2^14, 10 levels
    "ckks_fft": lambda: ckks_params(1 << 14, levels=10, scale_bits=30,
                                   num_special=3),
    # BASELINE.json config 1: N=8192, 3 RNS primes
    "baseline_roundtrip": lambda: ckks_params(1 << 13, levels=2, scale_bits=30),
    # north-star bench config: N=2^14.  α=5 special primes → J=2 key-switch
    # digits: 22% fewer inner-product MACs and 12% fewer NTT planes per
    # relinearization than α=3, still within the 128-bit bound
    # (log QP = 426 ≤ 438 at N=2^14).
    "bench_n14": lambda: ckks_params(1 << 14, levels=8, scale_bits=30,
                                    num_special=5),
    # reference matrix_operations.cpp:145-150 — BFV N=2^13
    "bfv_small": lambda: bfv_params(1 << 13, levels=2),
    # tiny fast-test configs (sec_level=0: test-only, too small to be secure)
    "test_tiny": lambda: ckks_params(1 << 10, levels=2, scale_bits=30,
                                     first_prime_bits=31, special_prime_bits=31,
                                     sec_level=0),
    # deep chain for iterative-math / fft tests
    "test_deep": lambda: ckks_params(1 << 11, levels=12, scale_bits=30,
                                     first_prime_bits=31, special_prime_bits=31,
                                     sec_level=0),
    # multi-prime-digit (dnum) key-switch coverage: α = 3 special primes
    "test_dnum": lambda: ckks_params(1 << 10, levels=7, scale_bits=30,
                                     first_prime_bits=31, special_prime_bits=31,
                                     num_special=3, sec_level=0),
    "test_bfv_tiny": lambda: bfv_params(1 << 10, levels=2, plain_bits=17,
                                        prime_bits=26, first_prime_bits=27,
                                        sec_level=0),
}


def chain_sweep(poly_degree: int = 1 << 15, min_levels: int = 2,
                max_levels: int = 26, sec_level: int = 128):
    """Yield (levels, params) like the reference's chain_levels 2..26 sweep
    (``math_operations.cpp:614-619``) — one generator instead of 26
    hand-built ladders (SURVEY.md §2c)."""
    for lv in range(min_levels, max_levels + 1):
        try:
            yield lv, ckks_params(poly_degree, levels=lv, scale_bits=30,
                                  sec_level=sec_level)
        except ValueError:
            return
