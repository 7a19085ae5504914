import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.ops import chol as chol_ops
from bobe_tpu.ops import kernels as kr

def timeit(name, fn, arg, reps=20):
    fn(arg).block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn(arg)
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/reps*1e3:.3f} ms")

rng = np.random.default_rng(0)
N = 1024
x = jnp.asarray(rng.uniform(size=(N, 8)))
mask = jnp.ones((N,))
K = kr.gram_masked("rbf", x, mask, jnp.ones((8,)), jnp.asarray(1.0), 1e-6)  # f64
print("K dtype:", K.dtype)
c_plain = jax.jit(jnp.linalg.cholesky)
c_block = jax.jit(chol_ops.cholesky_blocked)
L1 = c_plain(K); L2 = c_block(K)
err = float(jnp.max(jnp.abs(L1 - L2)))
print(f"max |L_plain - L_blocked| = {err:.3e}")
timeit("chol plain f64", c_plain, K)
timeit("chol blocked f64", c_block, K)
# f32 comparison too
K32 = K.astype(jnp.float32) + 3e-2*jnp.eye(N, dtype=jnp.float32)
timeit("chol plain f32", c_plain, K32)
timeit("chol blocked f32", c_block, K32)
