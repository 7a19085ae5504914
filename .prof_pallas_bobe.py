import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from jax.experimental import pallas as pl

def k_add(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + b_ref[...]

a = jnp.ones((256, 256), jnp.float32)
out = pl.pallas_call(
    k_add, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    grid=(2, 2),
    in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j)),
              pl.BlockSpec((128, 128), lambda i, j: (i, j))],
    out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)),
)(a, a)
print("bobe+minimal pallas:", float(out[0, 0]))
