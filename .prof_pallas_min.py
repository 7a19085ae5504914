import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import bobe_tpu  # x64 config

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
print("minimal pallas OK", float(out[0, 0]))

# now with iota + program_id (the eye construction)
def k_eye(a_ref, o_ref):
    i = pl.program_id(0); j = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    eye = jnp.where((rows == cols) & (i == j), 1.0, 0.0).astype(jnp.float32)
    o_ref[...] = a_ref[...] + eye
out = pl.pallas_call(
    k_eye, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    grid=(2, 2),
    in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j))],
    out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)),
)(a)
print("iota pallas OK", float(out[0, 0]))

# now with (TILE, d) narrow blocks + SMEM scalars
def k_nar(x_ref, s_ref, o_ref):
    x = x_ref[...]
    a2 = jnp.sum(x * x, axis=1)[:, None]
    o_ref[...] = a2 + s_ref[0, 0] + jnp.zeros((128, 128), jnp.float32)
x8 = jnp.ones((256, 8), jnp.float32)
s = jnp.full((1, 1), 2.0, jnp.float32)
out = pl.pallas_call(
    k_nar, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    grid=(2,),
    in_specs=[pl.BlockSpec((128, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec((128, 128), lambda i: (i, 0)),
)(x8, s)
print("narrow+smem pallas OK", float(out[0, 0]))
