"""Pallas key-switch inner-product kernel: batch-reuse of switching keys.

Computes the key-switch MAC  acc_c = Σ_j digit_j ⊙ ksk_{j,c}  over the
key basis (c = 0, 1) — the hot loop of every key switch (relinearize,
rotate, conjugate; behavioral parity: SEAL's ``switch_key_inplace``
inner product, used by the reference via ``he_operators.cpp`` relin /
rotate calls).

Hypothesis: the XLA elementwise formulation broadcasts the key over the
batch axis, so every key element might be re-read from HBM once per
batch row — at B=8, N=2^14, R=14, J=2 that would be ~235 MB of traffic
for ~29 MB of key data.  Here the grid is (R, B) with the batch
INNERMOST and the key block index constant in b, so Mosaic fetches each
key's [J, 2, N] slab into VMEM once per limb and reuses it across the
whole batch: keys are read exactly ONCE per op regardless of B.

STATUS (measured, v5e, round 5): NEGATIVE RESULT — default OFF.  The
hypothesis does not hold: XLA's emitted broadcast loop already reuses
the key slab (the standalone jnp inner product runs at ~200 GB/s
effective, impossible if keys were re-read per row).  Standalone at
B=8/N=2^14/R=14: jnp 0.290 ms vs this kernel 0.318 ms per step
(scripts/probe_ip.py); inside the fused mult+relin+rescale the kernel
is a ~6% headline REGRESSION (11,685 → 11,012 ops/s, back-to-back
bench.py A/B) because the pallas call boundary forces the extended
digits `ext` to materialize in HBM, where the jnp path lets XLA fuse
the decompose epilogue into the MAC loop.  Kept as an opt-in
(HETPU_PALLAS_IP=1) and as the documented measurement; don't re-enable
without re-measuring both numbers.

Bit-exactness: same j-ascending accumulation and the same 6-mul
``shoup_mul`` as the jnp path in ``evaluator._inner_product_raw`` —
pinned by tests/test_ip_kernel.py (interpret mode).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modular import mod_add, shoup_mul

_FORCE: bool | None = None           # tests override
_INTERPRET = False                   # tests: run the kernel interpreted


def enabled() -> bool:
    # default OFF: measured slower than the XLA broadcast path both
    # standalone and inside the fused op (see module docstring)
    if _FORCE is not None:
        return _FORCE
    env = os.environ.get("HETPU_PALLAS_IP")
    if env is None:
        return False
    return env not in ("0", "false", "off")


def inner_product_jnp(ext, k, ks, q):
    """Reference path: ext [..., J, R, N] standard NTT × Shoup keys
    k/ks [J, 2, R, N] → [..., 2, R, N] Montgomery NTT."""
    J = ext.shape[-3]
    acc = None
    for j in range(J):
        prod = shoup_mul(ext[..., j, None, :, :], k[j], ks[j], q)
        acc = prod if acc is None else mod_add(acc, prod, q)
    return acc


@lru_cache(maxsize=None)
def _call(J: int, R: int, B: int, n1: int, n2: int, interpret: bool):
    def kernel(ext_ref, k_ref, ks_ref, q_ref, out_ref):
        r = pl.program_id(0)
        qv = q_ref[r]
        for c in range(2):
            acc = None
            for j in range(J):
                t = shoup_mul(ext_ref[0, j, 0], k_ref[j, c, 0],
                              ks_ref[j, c, 0], qv)
                acc = t if acc is None else mod_add(acc, t, qv)
            out_ref[0, c, 0] = acc

    # grid (limb, batch-row) — batch INNERMOST: the key/companion block
    # index depends only on r, so consecutive b steps reuse the
    # VMEM-resident key slab without re-DMA (same revisiting pattern as
    # mxu_ntt's per-limb table reuse).
    def call(ext5, k5, ks5, q1):
        return pl.pallas_call(
            kernel,
            grid=(R, B),
            in_specs=[
                pl.BlockSpec((1, J, 1, n1, n2),
                             lambda r, b: (b, 0, r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((J, 2, 1, n1, n2),
                             lambda r, b: (0, 0, r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((J, 2, 1, n1, n2),
                             lambda r, b: (0, 0, r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 2, 1, n1, n2),
                                   lambda r, b: (b, 0, r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 2, R, n1, n2), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(ext5, k5, ks5, q1)

    return call


def inner_product(ext, k, ks, q):
    """Dispatch: Pallas kernel on TPU (keys read once per op), jnp
    broadcast fallback elsewhere.  Shapes as :func:`inner_product_jnp`."""
    J, R, N = ext.shape[-3:]
    if not enabled() or N % 128:
        return inner_product_jnp(ext, k, ks, q)
    lead = ext.shape[:-3]
    B = int(np.prod(lead)) if lead else 1
    n2 = 128
    n1 = N // n2
    ext5 = ext.reshape(B, J, R, n1, n2)
    k5 = k.reshape(J, 2, R, n1, n2)
    ks5 = ks.reshape(J, 2, R, n1, n2)
    q1 = jnp.asarray(np.asarray(q).reshape(-1).astype(np.uint32))
    out = _call(J, R, B, n1, n2, _INTERPRET)(ext5, k5, ks5, q1)
    return out.reshape(*lead, 2, R, N)
