import sys
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

which = sys.argv[1]
a = jnp.ones((256, 256), jnp.float32)
if which == "smem":
    def k(a_ref, s_ref, o_ref):
        o_ref[...] = a_ref[...] + s_ref[0, 0]
    s = jnp.full((1, 1), 2.0, jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2, 2),
        in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j)),
                  pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)),
    )(a, s)
elif which == "rowvec":
    def k(a_ref, m_ref, o_ref):
        o_ref[...] = a_ref[...] + m_ref[...][0][None, :]
    m = jnp.ones((1, 256), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2, 2),
        in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j)),
                  pl.BlockSpec((1, 128), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)),
    )(a, m)
elif which == "smem_vmem_default":
    def k(a_ref, s_ref, o_ref):
        o_ref[...] = a_ref[...] + s_ref[0, 0]
    s = jnp.full((1, 1), 2.0, jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2, 2),
        in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j)),
                  pl.BlockSpec((1, 1), lambda i, j: (0, 0))],
        out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)),
    )(a, s)
print(which, "OK", float(out[0, 0]), flush=True)
