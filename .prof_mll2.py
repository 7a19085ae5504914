import time
import numpy as np
import jax, jax.numpy as jnp
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

def gram(l):
    return kr.gram_masked("rbf", x, mask, l, amp, 1e-2)

timeit("gram only", jax.jit(lambda: jnp.sum(gram(ls))))
timeit("gram+chol sumL", jax.jit(lambda: jnp.sum(jnp.linalg.cholesky(gram(ls)))))
timeit("gram+chol logdet", jax.jit(lambda: jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(gram(ls)))))))
timeit("gram+chol+trisolve quad", jax.jit(lambda: jnp.sum(jax.scipy.linalg.solve_triangular(jnp.linalg.cholesky(gram(ls)), y, lower=True)**2)))
K0 = gram(ls)
cholK = jax.jit(lambda K: jnp.sum(jnp.linalg.cholesky(K)))
cholK(K0).block_until_ready()
t0=time.time()
for _ in range(30): r = cholK(K0)
r.block_until_ready()
print(f"chol(sum) given K arg: {(time.time()-t0)/30*1e3:.3f} ms")
