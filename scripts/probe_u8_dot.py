"""Probe: does Pallas TPU accept u8 x s8 -> i32 dot_general? And s8 LHS
with u8 RHS?  Determines the digit encoding for the MXU NTT kernel."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_pair(la, ra, name):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(0, 200, (128, 256)).astype(la))
    b = jnp.asarray(np.random.randint(-100, 100, (256, 128)).astype(ra))
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(a, b)
        ref = np.asarray(a, dtype=np.int64) @ np.asarray(b, dtype=np.int64)
        ok = np.array_equal(np.asarray(out, dtype=np.int64), ref)
        print(f"{name}: compiled, exact={ok}")
    except Exception as e:
        print(f"{name}: FAILED — {str(e)[:200]}")


try_pair(np.uint8, np.int8, "u8 x s8")
try_pair(np.int8, np.uint8, "s8 x u8")
try_pair(np.int8, np.int8, "s8 x s8")
try_pair(np.uint8, np.uint8, "u8 x u8")
