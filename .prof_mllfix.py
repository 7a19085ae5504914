import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import bobe_tpu
from bobe_tpu.ops import kernels as kr
from bobe_tpu.ops import chol as chol_ops

def timeit(name, fn, reps=30):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn()
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/reps*1e3:.3f} ms")

rng = np.random.default_rng(0)
N = 1024
x = jnp.asarray(rng.uniform(size=(N, 8)), jnp.float32)
mask = jnp.ones((N,), jnp.float32)
ls = jnp.ones((8,), jnp.float32); amp = jnp.asarray(1.0, jnp.float32)
y = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
LOG_2PI = np.log(2*np.pi)

def mll_plain(l):
    K = kr.gram_masked("rbf", x, mask, l, amp, 1e-2)
    L = jnp.linalg.cholesky(K)
    alpha = chol_ops.cho_solve(L, y)
    return -0.5*jnp.dot(y, alpha) - jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5*N*LOG_2PI

def mll_barrier(l):
    K = kr.gram_masked("rbf", x, mask, l, amp, 1e-2)
    K = lax.optimization_barrier(K)
    L = jnp.linalg.cholesky(K)
    L = lax.optimization_barrier(L)
    alpha = chol_ops.cho_solve(L, y)
    return -0.5*jnp.dot(y, alpha) - jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5*N*LOG_2PI

def mll_tri(l):
    K = kr.gram_masked("rbf", x, mask, l, amp, 1e-2)
    L = jnp.linalg.cholesky(K)
    v = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    return -0.5*jnp.dot(v, v) - jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5*N*LOG_2PI

timeit("mll plain", jax.jit(lambda: mll_plain(ls)))
timeit("mll barrier", jax.jit(lambda: mll_barrier(ls)))
timeit("mll one-trisolve", jax.jit(lambda: mll_tri(ls)))
timeit("valgrad mll plain", jax.jit(lambda: jax.value_and_grad(mll_plain)(ls)[0]))
timeit("valgrad mll barrier", jax.jit(lambda: jax.value_and_grad(mll_barrier)(ls)[0]))
timeit("valgrad mll one-trisolve", jax.jit(lambda: jax.value_and_grad(mll_tri)(ls)[0]))
