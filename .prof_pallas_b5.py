import sys
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from jax.experimental import pallas as pl

which = sys.argv[1]
a = jnp.ones((1024, 128), jnp.float32)
F32 = jnp.float32

if which == "gridfree":
    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.dot(x, x.T, preferred_element_type=F32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1024, 1024), jnp.float32),
    )(a)
elif which == "rowstrip":
    def k(xa_ref, xb_ref, o_ref):
        o_ref[...] = jnp.dot(xa_ref[...], xb_ref[...].T, preferred_element_type=F32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1024, 1024), jnp.float32),
        grid=(8,),
        in_specs=[pl.BlockSpec((128, 128), lambda i: (i, 0)),
                  pl.BlockSpec((1024, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((128, 1024), lambda i: (i, 0)))(a, a)
print(which, "OK", out.shape, float(out[0,0]), flush=True)
