"""Pallas-fused four-step NTT kernels.

The XLA stage loop materializes every butterfly stage to HBM
(~14×(read+write) per transform — measured ~77 ms for the key-switch
extension tensor at N=2^14, B=128).  This kernel runs ALL stages of both
sub-transforms, the twiddle matrix, and the transposes inside VMEM:
HBM traffic drops to one read + one write.

Grid: one program per (row, limb) plane [n1, n2] (64–256 KB).  Twiddle
tables ride whole in VMEM (≤ ~1 MB for a full key basis) and are indexed
by the limb program id.  Butterflies reshape only the sublane axis; the
lane axis stays 128-aligned through the in-register transposes.

Used automatically by ntt4.ntt_fwd/ntt_inv on TPU backends (pure-jnp path
remains for CPU tests and as the bit-exact reference — parity pinned by
tests/test_pallas_ntt.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modular import mod_add, mod_sub, shoup_mul

_FORCE: bool | None = None     # tests override


def enabled() -> bool:
    if _FORCE is not None:
        return _FORCE
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def stage_columns(tables) -> tuple[np.ndarray, ...]:
    """Per-stage v-half twiddle columns for a sub-NTT table set.

    Mosaic can't reshape tiny twiddle vectors, so stage twiddles are
    pre-broadcast to length-n/2 columns matching the FLATTENED v-half
    layout ([m, half] → n/2 rows): only the v rows get multiplied —
    half the multiplies of a full-column formulation.
    fwd[s, n/2]: stage s of the CT-DIT loop (m = 2^s)."""
    n = tables.n
    S = n.bit_length() - 1
    L = len(tables.primes)
    fwd = np.ones((L, S, n // 2), dtype=np.uint32)
    inv = np.ones((L, S, n // 2), dtype=np.uint32)
    for s in range(S):
        m = 1 << s
        half = n // (2 * m)
        for b in range(m):
            fwd[:, s, b * half: (b + 1) * half] = tables.fwd_w[:, m + b][:, None]
        mi = n >> (s + 1)          # inverse loop runs m = n/2 … 1
        half_i = n // (2 * mi)
        for b in range(mi):
            inv[:, s, b * half_i: (b + 1) * half_i] = \
                tables.inv_w[:, mi + b][:, None]
    from .modular import shoup_precompute
    q3 = np.repeat(tables.q[:, None, :], S, axis=1)
    return (fwd, shoup_precompute(fwd, q3), inv, shoup_precompute(inv, q3))


def _fwd_stages(x, wcols, wcols_shoup, q, n):
    """CT-DIT butterflies along axis -2 of [R, n, V]; twiddle columns
    cover only the flattened v-half."""
    R, _, V = x.shape
    S = n.bit_length() - 1
    m, half = 1, n // 2
    for s in range(S):
        z = x.reshape(R, m, 2, half, V)
        u = z[:, :, 0].reshape(R, n // 2, V)
        v = z[:, :, 1].reshape(R, n // 2, V)
        v = shoup_mul(v, wcols[s][:, None], wcols_shoup[s][:, None], q)
        sm = mod_add(u, v, q).reshape(R, m, half, V)
        df = mod_sub(u, v, q).reshape(R, m, half, V)
        x = jnp.stack([sm, df], axis=2).reshape(R, n, V)
        m *= 2
        half //= 2
    return x


def _inv_stages(x, wcols, wcols_shoup, q, n):
    """GS butterflies: add/sub first, then twiddle the difference half."""
    R, _, V = x.shape
    S = n.bit_length() - 1
    m, half = n // 2, 1
    for s in range(S):
        z = x.reshape(R, m, 2, half, V)
        u = z[:, :, 0].reshape(R, n // 2, V)
        v = z[:, :, 1].reshape(R, n // 2, V)
        sm = mod_add(u, v, q)
        df = shoup_mul(mod_sub(u, v, q), wcols[s][:, None],
                       wcols_shoup[s][:, None], q)
        x = jnp.stack([sm.reshape(R, m, half, V), df.reshape(R, m, half, V)],
                      axis=2).reshape(R, n, V)
        m //= 2
        half *= 2
    return x


def _row_block(rows: int, n1: int, n2: int) -> int:
    """Planes per program.  >1 currently stalls Mosaic compilation (the
    batched 5-D stage reshapes blow up lowering time); the kernel body is
    written generically so this can be raised when the toolchain allows."""
    return 1


def _vmem_full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _smem_full():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


_COLS_CACHE: dict = {}


def _cols(t):
    """(sub1_cols, sub2_cols) for a FourStepTables, cached by identity."""
    key = id(t)
    hit = _COLS_CACHE.get(key)
    if hit is None:
        hit = _COLS_CACHE[key] = (stage_columns(t.sub1), stage_columns(t.sub2))
    return hit


@lru_cache(maxsize=None)
def _fwd_call(n1: int, n2: int, L: int, to_mont: bool):
    def kernel(x_ref, w1c_ref, w1cs_ref, w2c_ref, w2cs_ref, tm_ref, tms_ref,
               q_ref, r_ref, rs_ref, out_ref):
        l = pl.program_id(1)
        q = q_ref[l, 0]
        x = x_ref[:, 0]                                     # [R, n1, n2]
        x = _fwd_stages(x, w1c_ref[l], w1cs_ref[l], q, n1)  # along n1
        x = shoup_mul(x, tm_ref[l], tms_ref[l], q)          # twiddle matrix
        x = jnp.swapaxes(x, -1, -2)                         # [R, n2, n1]
        x = _fwd_stages(x, w2c_ref[l], w2cs_ref[l], q, n2)  # along n2
        if to_mont:
            x = shoup_mul(x, r_ref[l, 0], rs_ref[l, 0], q)
        out_ref[:, 0] = jnp.swapaxes(x, -1, -2)

    def call(x, t):
        lead = x.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        xr = x.reshape(rows, L, n1, n2)
        rb = _row_block(rows, n1, n2)
        (w1f, w1fs, _, _), (w2f, w2fs, _, _) = _cols(t)
        out = pl.pallas_call(
            kernel,
            grid=(rows // rb, L),
            in_specs=[
                pl.BlockSpec((rb, 1, n1, n2), lambda r, l: (r, l, 0, 0),
                             memory_space=pltpu.VMEM),
                _vmem_full(), _vmem_full(), _vmem_full(), _vmem_full(),
                _vmem_full(), _vmem_full(),
                _smem_full(), _smem_full(), _smem_full(),
            ],
            out_specs=pl.BlockSpec((rb, 1, n1, n2), lambda r, l: (r, l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, L, n1, n2), jnp.uint32),
        )(xr, w1f, w1fs, w2f, w2fs, t.t_fwd, t.t_fwd_shoup,
          t.q, t.r, t.r_shoup)
        return out.reshape(*lead, L, n1 * n2)

    return call


@lru_cache(maxsize=None)
def _inv_call(n1: int, n2: int, L: int, strip_mont: bool):
    def kernel(x_ref, w1c_ref, w1cs_ref, w2c_ref, w2cs_ref, tm_ref, tms_ref,
               q_ref, s2n_ref, s2ns_ref, s1n_ref, s1ns_ref, out_ref):
        l = pl.program_id(1)
        q = q_ref[l, 0]
        x = x_ref[:, 0]                                     # [R, n1, n2]
        x = jnp.swapaxes(x, -1, -2)                         # [R, n2, n1]
        x = _inv_stages(x, w2c_ref[l], w2cs_ref[l], q, n2)
        x = shoup_mul(x, s2n_ref[l, 0], s2ns_ref[l, 0], q)  # n2^{-1}
        x = jnp.swapaxes(x, -1, -2)                         # [R, n1, n2]
        x = shoup_mul(x, tm_ref[l], tms_ref[l], q)          # inverse twiddles
        x = _inv_stages(x, w1c_ref[l], w1cs_ref[l], q, n1)
        x = shoup_mul(x, s1n_ref[l, 0], s1ns_ref[l, 0], q)  # n1^{-1}(·R^{-1})
        out_ref[:, 0] = x

    def call(x, t):
        lead = x.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        xr = x.reshape(rows, L, n1, n2)
        rb = _row_block(rows, n1, n2)
        (_, _, w1i, w1is), (_, _, w2i, w2is) = _cols(t)
        s1n = t.sub1.n_inv_rinv if strip_mont else t.sub1.n_inv
        s1ns = t.sub1.n_inv_rinv_shoup if strip_mont else t.sub1.n_inv_shoup
        out = pl.pallas_call(
            kernel,
            grid=(rows // rb, L),
            in_specs=[
                pl.BlockSpec((rb, 1, n1, n2), lambda r, l: (r, l, 0, 0),
                             memory_space=pltpu.VMEM),
                _vmem_full(), _vmem_full(), _vmem_full(), _vmem_full(),
                _vmem_full(), _vmem_full(),
                _smem_full(), _smem_full(), _smem_full(), _smem_full(),
                _smem_full(),
            ],
            out_specs=pl.BlockSpec((rb, 1, n1, n2), lambda r, l: (r, l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, L, n1, n2), jnp.uint32),
        )(xr, w1i, w1is, w2i, w2is, t.t_inv, t.t_inv_shoup, t.q,
          t.sub2.n_inv, t.sub2.n_inv_shoup, s1n, s1ns)
        return out.reshape(*lead, L, n1 * n2)

    return call


def ntt_fwd(a, t, *, to_mont: bool = False):
    return _fwd_call(t.n1, t.n2, len(t.primes), to_mont)(a, t)


def ntt_inv(a, t, *, strip_mont: bool = False):
    return _inv_call(t.n1, t.n2, len(t.primes), strip_mont)(a, t)
