import sys
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from jax.experimental import pallas as pl

which = sys.argv[1]
a = jnp.ones((256, 256), jnp.float32)
F32 = jnp.float32

if which == "rowcol_maps":
    def k(xa_ref, xb_ref, o_ref):
        o_ref[...] = xa_ref[...] + xb_ref[...]
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2, 2),
        in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, 0)),
                  pl.BlockSpec((128, 128), lambda i, j: (j, 0))],
        out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)))(a, a)
elif which == "same_array_twice":
    def k(xa_ref, xb_ref, o_ref):
        o_ref[...] = xa_ref[...] + xb_ref[...]
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2, 2),
        in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j)),
                  pl.BlockSpec((128, 128), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)))(a, a)
elif which == "full_gram_shape":
    # the actual gram kernel structure but trivial body
    def k(xa_ref, xb_ref, auxa_ref, auxb_ref, o_ref):
        o_ref[...] = xa_ref[...] + xb_ref[...] + auxa_ref[...] + auxb_ref[...]
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2, 2),
        in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, 0)),
                  pl.BlockSpec((128, 128), lambda i, j: (j, 0)),
                  pl.BlockSpec((128, 128), lambda i, j: (i, 0)),
                  pl.BlockSpec((128, 128), lambda i, j: (j, 0))],
        out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)))(a, a, a, a)
print(which, "OK", float(out[0, 0]), flush=True)
