import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.ops import kernels as kr

rng = np.random.default_rng(0)
N, D = 1024, 8

def timeit(name, fn, reps=50):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn()
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/reps*1e3:.3f} ms")

for dt in (jnp.float32, jnp.float64):
    x = jnp.asarray(rng.uniform(size=(N, D)), dtype=dt)
    A = jnp.asarray(rng.normal(size=(N, N)), dtype=dt)
    K = (A @ A.T / N + N * jnp.eye(N, dtype=dt))
    ls = jnp.ones((D,), dt); amp = jnp.asarray(1.0, dt)
    mask = jnp.ones((N,), dt)
    chol = jax.jit(jnp.linalg.cholesky)
    timeit(f"chol {dt.__name__} {N}", lambda: chol(K))
    K4 = jnp.tile(K[None], (4,1,1))
    timeit(f"chol batch4 {dt.__name__}", lambda: chol(K4))
    gram = jax.jit(lambda x: kr.gram_masked("rbf", x, mask, ls, amp, 1e-2))
    timeit(f"gram {dt.__name__}", lambda: gram(x))
    sol = jax.jit(lambda K: jax.scipy.linalg.solve_triangular(jnp.linalg.cholesky(K), jnp.ones((N,), dt), lower=True))
    timeit(f"chol+trisolve {dt.__name__}", lambda: sol(K))
