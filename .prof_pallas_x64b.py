import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl

def k_add(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + b_ref[...]

a = jnp.ones((256, 256), jnp.float32)
try:
    out = pl.pallas_call(
        k_add, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2, 2),
        in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j)),
                  pl.BlockSpec((128, 128), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)),
    )(a, a)
    print("x64 pallas OK:", float(out[0, 0]))
except Exception as e:
    print("x64 pallas FAILED:", type(e).__name__)
