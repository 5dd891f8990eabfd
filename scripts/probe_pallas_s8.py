import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
w = jnp.asarray(rng.integers(-128, 128, (512, 512), dtype=np.int8))
x = jnp.asarray(rng.integers(-128, 128, (512, 128), dtype=np.int8))

def kernel(w_ref, x_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

out = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int32),
)(w, x)
ref = np.asarray(w, np.int64) @ np.asarray(x, np.int64)
print("pallas s8 dot exact:", (ref == np.asarray(out, np.int64)).all())
