import sys
sys.setrecursionlimit(100000)
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from jax.experimental import pallas as pl
F32 = jnp.float32

which = sys.argv[1]
if which == "trivial_fori":
    def kern(a_ref, o_ref):
        A = a_ref[...]
        def body(j, A):
            return A + F32(1.0)
        o_ref[...] = jax.lax.fori_loop(0, 128, body, A)
    a = jnp.zeros((128, 128), F32)
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128, 128), F32))(a)
    print("trivial fori OK", float(out[0,0]), flush=True)
elif which == "iota_fori":
    def kern(a_ref, o_ref):
        A = a_ref[...]
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        def body(j, A):
            return jnp.where(rows == j, A + F32(1.0), A)
        o_ref[...] = jax.lax.fori_loop(0, 128, body, A)
    a = jnp.zeros((128, 128), F32)
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128, 128), F32))(a)
    print("iota fori OK", float(out[0,0]), float(out[5,5]), flush=True)
elif which == "reduce_fori":
    def kern(a_ref, o_ref):
        A = a_ref[...]
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        def body(j, A):
            diag = jnp.sum(jnp.where((rows == j) & (cols == j), A, F32(0.0)))
            colv = jnp.sum(jnp.where(cols == j, A, F32(0.0)), axis=1)
            return A + diag * F32(1e-6) + colv[:, None] * F32(1e-6)
        o_ref[...] = jax.lax.fori_loop(0, 128, body, A)
    a = jnp.ones((128, 128), F32)
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128, 128), F32))(a)
    print("reduce fori OK", float(out[0,0]), flush=True)

if which == "iota_inside":
    def kern(a_ref, o_ref):
        A = a_ref[...]
        def body(j, A):
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            return jnp.where(rows == j, A + F32(1.0), A)
        o_ref[...] = jax.lax.fori_loop(0, 128, body, A)
    a = jnp.zeros((128, 128), F32)
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128, 128), F32))(a)
    print("iota inside OK", float(out[0,0]), flush=True)
if which == "scan_iota":
    def kern(a_ref, o_ref):
        A = a_ref[...]
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        def body(A, j):
            return jnp.where(rows == j, A + F32(1.0), A), None
        A, _ = jax.lax.scan(body, A, jnp.arange(128, dtype=jnp.int32))
        o_ref[...] = A
    a = jnp.zeros((128, 128), F32)
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128, 128), F32))(a)
    print("scan iota OK", float(out[0,0]), flush=True)
