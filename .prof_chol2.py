import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.ops import kernels as kr

def timeit(name, fn, arg, reps=50):
    fn(arg).block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn(arg)
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/reps*1e3:.3f} ms")

rng = np.random.default_rng(0)
N = 1024
A = jnp.asarray(rng.normal(size=(N,N)), jnp.float32)
K_dd = A @ A.T / N + N*jnp.eye(N, dtype=jnp.float32)
x = jnp.asarray(rng.uniform(size=(N, 8)), jnp.float32)
mask = jnp.ones((N,), jnp.float32)
K_rbf = kr.gram_masked("rbf", x, mask, jnp.ones((8,), jnp.float32),
                       jnp.asarray(1.0, jnp.float32), 1e-2)
chol_arr = jax.jit(jnp.linalg.cholesky)          # returns array
chol_sum = jax.jit(lambda K: jnp.sum(jnp.linalg.cholesky(K)))  # returns scalar
timeit("chol->array  diag-dominant", chol_arr, K_dd)
timeit("chol->array  rbf-gram     ", chol_arr, K_rbf)
timeit("chol->scalar diag-dominant", chol_sum, K_dd)
timeit("chol->scalar rbf-gram     ", chol_sum, K_rbf)
