import sys, time
sys.setrecursionlimit(1000000)
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from jax.experimental import pallas as pl
F32 = jnp.float32

def kern(a_ref, o_ref):
    A = a_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)[:, 0]
    for j in range(128):  # static -> masks fold
        diag = jnp.sum(jnp.where((rows == j) & (cols == j), A, F32(0.0)))
        dinv = jax.lax.rsqrt(diag)
        colv = jnp.sum(jnp.where(cols == j, A, F32(0.0)), axis=1)
        l = jnp.where(rows1 > j, colv * dinv,
                      jnp.where(rows1 == j, jnp.sqrt(diag), F32(0.0)))
        A = jnp.where(cols == j, l[:, None], A)
        A = jnp.where((rows > j) & (cols > j),
                      A - l[:, None] * l[None, :], A)
    o_ref[...] = A

rng = np.random.default_rng(0)
B = jnp.asarray(rng.normal(size=(128, 128)), F32)
K = B @ B.T / 128 + 4.0 * jnp.eye(128, dtype=F32)
t0 = time.time()
f = jax.jit(lambda K: pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128, 128), F32))(K))
L = f(K); L.block_until_ready()
print(f"compile+run: {time.time()-t0:.1f}s")
Lref = jnp.linalg.cholesky(K)
print("max err:", float(jnp.max(jnp.abs(L - Lref))))
t0=time.time()
for _ in range(30): r = f(K)
r.block_until_ready()
print(f"steady: {(time.time()-t0)/30*1e3:.3f} ms")
