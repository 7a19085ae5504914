import sys
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from jax.experimental import pallas as pl

which = sys.argv[1]
a = jnp.ones((256, 256), jnp.float32)
F32 = jnp.float32

def build(kern, nin=1):
    ins = [pl.BlockSpec((128, 128), lambda i, j: (i, j))] * nin
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2, 2), in_specs=ins,
        out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)))

if which == "rowsum":
    def k(a_ref, o_ref):
        x = a_ref[...]
        o_ref[...] = jnp.sum(x * x, axis=1)[:, None] + x
    out = build(k)(a)
elif which == "col0":
    def k(a_ref, o_ref):
        x = a_ref[...]
        o_ref[...] = x + x[:, 0][:, None]
    out = build(k)(a)
elif which == "matmul":
    def k(a_ref, o_ref):
        x = a_ref[...]
        o_ref[...] = jnp.dot(x, x.T, preferred_element_type=F32)
    out = build(k)(a)
elif which == "iota_eye":
    def k(a_ref, o_ref):
        i = pl.program_id(0); j = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        eye = ((rows == cols) & (i == j)).astype(F32)
        o_ref[...] = a_ref[...] + eye
    out = build(k)(a)
elif which == "expmax":
    def k(a_ref, o_ref):
        x = a_ref[...]
        o_ref[...] = jnp.exp(F32(-0.5) * jnp.maximum(x, F32(0.0)))
    out = build(k)(a)
print(which, "OK", float(out[0, 0]), flush=True)
