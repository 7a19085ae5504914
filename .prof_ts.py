import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu

def timeit(name, fn, reps=30):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn()
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/reps*1e3:.3f} ms")

rng = np.random.default_rng(0)
N = 1024
A = jnp.asarray(rng.normal(size=(N,N)), jnp.float32)
K = A @ A.T / N + N*jnp.eye(N, dtype=jnp.float32)
L = jnp.linalg.cholesky(K)
for m in (1, 64, 1024):
    B = jnp.asarray(rng.normal(size=(N, m)), jnp.float32)
    ts = jax.jit(lambda L, B: jax.scipy.linalg.solve_triangular(L, B, lower=True))
    timeit(f"trisolve f32 rhs={m}", lambda: ts(L, B))
# batched x4 1 rhs
L4 = jnp.tile(L[None], (4,1,1)); b4 = jnp.asarray(rng.normal(size=(4,N,1)), jnp.float32)
ts4 = jax.jit(lambda L, B: jax.scipy.linalg.solve_triangular(L, B, lower=True))
timeit("trisolve f32 batch4 rhs=1", lambda: ts4(L4, b4))
# f64 variants
L64 = L.astype(jnp.float64)
for m in (1, 64, 1024):
    B = jnp.asarray(rng.normal(size=(N, m)), jnp.float64)
    ts = jax.jit(lambda L, B: jax.scipy.linalg.solve_triangular(L, B, lower=True))
    timeit(f"trisolve f64 rhs={m}", lambda: ts(L64, B))
# chol grad cost
def mllish(K):
    L = jnp.linalg.cholesky(K)
    return jnp.sum(jnp.log(jnp.diag(L)))
g = jax.jit(jax.grad(mllish))
timeit("grad(logdet o chol) f32", lambda: g(K))
