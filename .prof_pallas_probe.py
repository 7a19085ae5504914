import sys
sys.setrecursionlimit(100000)
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from jax.experimental import pallas as pl
from bobe_tpu.ops.pallas_gram import gram_masked_pallas

which = sys.argv[1]
F32 = jnp.float32

if which == "vmap":
    x4 = jnp.ones((4, 256, 8), F32) * jnp.arange(4).reshape(4,1,1).astype(F32) * 0.1
    mask = jnp.ones((256,), F32)
    ls4 = jnp.ones((4, 8), F32)
    f = jax.vmap(lambda x, l: gram_masked_pallas("rbf", x, mask, l, jnp.asarray(1.0, F32), 1e-2))
    K = jax.jit(f)(x4, ls4)
    print("vmap pallas OK", K.shape, flush=True)
elif which == "cholloop":
    # in-kernel masked-column Cholesky of a 128x128 tile
    def kern(a_ref, o_ref):
        A = a_ref[...]
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)[:, 0]

        def body(j, A):
            diag = jnp.sum(jnp.where((rows == j) & (cols == j), A, 0.0))
            dinv = jax.lax.rsqrt(diag)
            colv = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1)  # (128,)
            l = jnp.where(rows1 > j, colv * dinv,
                          jnp.where(rows1 == j, jnp.sqrt(diag), colv))
            A = jnp.where(cols == j, l[:, None], A)
            A = jnp.where((rows > j) & (cols > j),
                          A - l[:, None] * l[None, :], A)
            return A

        L = jax.lax.fori_loop(0, 128, body, A)
        o_ref[...] = jnp.where(rows >= cols, L, 0.0)

    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.normal(size=(128, 128)), F32)
    K = B @ B.T / 128 + 4.0 * jnp.eye(128, dtype=F32)
    L = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128, 128), F32))(K)
    Lref = jnp.linalg.cholesky(K)
    err = float(jnp.max(jnp.abs(L - Lref)))
    print("in-kernel chol128 OK, max err:", err, flush=True)
