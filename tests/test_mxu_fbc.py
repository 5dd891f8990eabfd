"""MXU digit-matmul base conversion vs the shoup-loop reference path.

The lift (no alpha) legitimately differs from the uncentered shoup loop by
a multiple of the source product D (centered vs uncentered representative)
— equality is checked mod-D-consistently; the alpha path must agree with
rns.fbc_apply exactly away from f32 rounding ties (inputs here are far
from half-integer alpha, like every key-switch use site).
"""

import numpy as np
import pytest

from hetpu.core import rns
from hetpu.core.context import Context
from hetpu.core.mxu_fbc import MxuFbcPlan, fbc_plan, lift_plan
from hetpu.core.params import preset


@pytest.fixture(scope="module")
def ctx():
    return Context(preset("test_dnum"))


def test_fbc_alpha_matches_reference(ctx, rng):
    """Centered-alpha MXU conversion == fbc_apply on centered values."""
    lvl = ctx.num_data - 1
    plan = ctx.keyswitch_plan(lvl).moddown
    fp = plan.fbc
    S = fp.p.shape[0]
    N = ctx.params.poly_degree
    # centered small values (well within (-P/2, P/2)): exact conversion
    # must reproduce them on the destination basis
    P = 1
    for p in fp.p[:, 0]:
        P *= int(p)
    vals = rng.integers(-(1 << 40), 1 << 40, (N,))
    y = np.stack([(vals % int(p)).astype(np.uint32) for p in fp.p[:, 0]])
    import jax.numpy as jnp
    # the plan consumes PREMULTIPLIED residues y_i * (P/p_i)^{-1} mod p_i
    # (the fbc_apply premul step / INTT-epilogue fold)
    from hetpu.core.modular import shoup_mul
    yp = np.asarray(shoup_mul(jnp.asarray(y), jnp.asarray(fp.inv_punit),
                              jnp.asarray(fp.inv_punit_shoup),
                              jnp.asarray(fp.p)))
    got = np.asarray(fbc_plan(fp).apply(jnp.asarray(yp[None])))[0]
    want = np.stack([(vals % int(r)).astype(np.uint32) for r in fp.r[:, 0]])
    np.testing.assert_array_equal(got, want)
    # and it matches the shoup-loop path bit-for-bit
    ref = np.asarray(rns.fbc_apply(jnp.asarray(y[None]), fp, correct=True,
                                   premul=True))[0]
    np.testing.assert_array_equal(got, ref)


def test_fbc_extra_folds_constant(ctx, rng):
    lvl = ctx.num_data - 1
    fp = ctx.keyswitch_plan(lvl).moddown.fbc
    N = 64
    import jax.numpy as jnp
    y = np.stack([rng.integers(0, int(p), N, dtype=np.uint64).astype(np.uint32)
                  for p in fp.p[:, 0]])
    extra = np.arange(3, 3 + fp.r.shape[0], dtype=np.uint32)
    base = np.asarray(fbc_plan(fp).apply(jnp.asarray(y)))
    fold = np.asarray(fbc_plan(fp, extra=extra).apply(jnp.asarray(y)))
    for j, r in enumerate(fp.r[:, 0]):
        np.testing.assert_array_equal(
            fold[j], base[j].astype(np.uint64) * extra[j] % int(r))


def test_lift_congruent_mod_digit_product(ctx, rng):
    """MXU lift == centered exact lift: for each foreign prime r,
    out_r = (sum_i center(y_i) * dhat_i) mod r, computed in bigint."""
    lvl = ctx.num_data - 1
    plan = ctx.keyswitch_plan(lvl)
    N = 128
    import jax.numpy as jnp
    for di, (lo, hi) in enumerate(plan.digit_bounds):
        src = [int(plan.q[i, 0]) for i in range(lo, hi)]
        foreign = plan.foreign_idx[di]
        y = np.stack([rng.integers(0, p, N, dtype=np.uint64).astype(np.uint32)
                      for p in src])
        got = np.asarray(lift_plan(plan, di).apply(jnp.asarray(y)))
        cent = [np.where(y[i] > src[i] // 2,
                         y[i].astype(np.int64) - src[i],
                         y[i].astype(np.int64)) for i in range(len(src))]
        for fj, f in enumerate(foreign):
            r = int(plan.q[f, 0])
            want = np.zeros(N, dtype=object)
            for i in range(len(src)):
                want = want + cent[i].astype(object) * int(plan.dhat[lo + i, f])
            np.testing.assert_array_equal(got[fj], (want % r).astype(np.uint32))


def test_alpha_row_bound():
    with pytest.raises(AssertionError):
        MxuFbcPlan([3] * 200, [5], np.ones((200, 1), dtype=np.uint32))
