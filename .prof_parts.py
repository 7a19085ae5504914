import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.ops import kernels as kr
from bobe_tpu.ops.pallas_gram import gram_masked_pallas
from bobe_tpu.models import gp as gpm

rng = np.random.default_rng(0)
N, D, R = 1024, 8, 4

def timeit(name, fn, reps=50):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn()
    r.block_until_ready()
    dt = (time.time()-t0)/reps*1e3
    print(f"{name}: {dt:.3f} ms")
    return dt

x = jnp.asarray(rng.uniform(size=(N, D)), jnp.float32)
mask = jnp.ones((N,), jnp.float32)
ls = jnp.ones((D,), jnp.float32); amp = jnp.asarray(1.0, jnp.float32)

g_x = jax.jit(lambda ls: kr.gram_masked("rbf", x, mask, ls, amp, 1e-2))
timeit("gram XLA f32", lambda: g_x(ls))
g_p = jax.jit(lambda ls: gram_masked_pallas("rbf", x, mask, ls, amp, 1e-2))
timeit("gram Pallas f32", lambda: g_p(ls))

# vmapped over 4 restarts (different ls per lane)
ls4 = jnp.tile(ls[None], (R,1)) * (1.0 + 0.1*jnp.arange(R)[:,None])
gv_x = jax.jit(jax.vmap(lambda l: kr.gram_masked("rbf", x, mask, l, amp, 1e-2)))
timeit("gram XLA x4", lambda: gv_x(ls4))
gv_p = jax.jit(jax.vmap(lambda l: gram_masked_pallas("rbf", x, mask, l, amp, 1e-2)))
timeit("gram Pallas x4", lambda: gv_p(ls4))

# batched chol + trisolve 1 rhs
K4 = gv_x(ls4) + 3e-2*jnp.eye(N, dtype=jnp.float32)
y = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
c4 = jax.jit(lambda K: jnp.linalg.cholesky(K))
timeit("chol x4", lambda: c4(K4))
L4 = c4(K4)
ts4 = jax.jit(jax.vmap(lambda L: jax.scipy.linalg.solve_triangular(L, y, lower=True)))
timeit("trisolve 1rhs x4", lambda: ts4(L4))
# full mll pieces fused
def mll_one(l):
    K = kr.gram_masked("rbf", x, mask, l, amp, 3e-2)
    L = jnp.linalg.cholesky(K)
    v = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    return 0.5*jnp.sum(v*v) + jnp.sum(jnp.log(jnp.diag(L)))
m4 = jax.jit(jax.vmap(mll_one))
timeit("mll value x4", lambda: m4(ls4))
mg4 = jax.jit(jax.vmap(jax.value_and_grad(mll_one)))
timeit("mll valgrad x4", lambda: mg4(ls4)[0])
