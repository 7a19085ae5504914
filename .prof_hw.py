import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu

def timeit(name, fn, reps=30):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn()
    r.block_until_ready()
    dt=(time.time()-t0)/reps*1e3
    print(f"{name}: {dt:.3f} ms")
    return dt

rng = np.random.default_rng(0)
A32 = jnp.asarray(rng.normal(size=(1024,1024)), jnp.float32)
A16 = A32.astype(jnp.bfloat16)
e32 = jax.jit(lambda a: jnp.exp(a))
e16 = jax.jit(lambda a: jnp.exp(a))
timeit("exp f32 1M", lambda: e32(A32))
timeit("exp bf16 1M", lambda: e16(A16))
timeit("exp f32 4M batch", lambda: e32(jnp.tile(A32[None],(4,1,1))), reps=10)

A64 = jnp.asarray(rng.normal(size=(1024,1024)), jnp.float64)
mm64 = jax.jit(lambda a: a @ a.T)
timeit("matmul f64 1024^3", lambda: mm64(A64))
mm32 = jax.jit(lambda a: a @ a.T)
timeit("matmul f32 1024^3", lambda: mm32(A32))

B64 = jnp.asarray(rng.normal(size=(128,128)), jnp.float64)
K64 = B64 @ B64.T + 128*jnp.eye(128, dtype=jnp.float64)
c128 = jax.jit(jnp.linalg.cholesky)
timeit("chol f64 128", lambda: c128(K64))
ts64 = jax.jit(lambda L, B: jax.scipy.linalg.solve_triangular(L, B, lower=True))
L128 = c128(K64)
B = jnp.asarray(rng.normal(size=(128, 896)), jnp.float64)
timeit("trisolve f64 128x896", lambda: ts64(L128, B))
