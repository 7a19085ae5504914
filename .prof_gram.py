import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.ops import kernels as kr
from bobe_tpu.ops import mll as mll_ops

def timeit(name, fn, reps=30):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn()
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/reps*1e3:.3f} ms")

rng = np.random.default_rng(0)
N, D = 1024, 8
x = jnp.asarray(rng.uniform(size=(N, D)), jnp.float32)
mask = jnp.ones((N,), jnp.float32)
ls = jnp.ones((D,), jnp.float32); amp = jnp.asarray(1.0, jnp.float32)

sq = jax.jit(lambda x, ls: kr.sq_dist(x/ls, x/ls))
timeit("sq_dist", lambda: sq(x, ls))
D2 = sq(x, ls)
co = jax.jit(lambda d: jnp.exp(-0.5*d))
timeit("corr exp", lambda: co(D2))
Kc = co(D2)
ma = jax.jit(lambda k, m: k * (m[:,None]*m[None,:]) + (1e-2*m + (1.0-m))*jnp.eye(k.shape[0], dtype=k.dtype))
timeit("masking", lambda: ma(Kc, mask))
gm = jax.jit(lambda x, m, l, a: kr.gram_masked("rbf", x, m, l, a, 1e-2))
timeit("gram_masked fused", lambda: gm(x, mask, ls, amp))
K = gm(x, mask, ls, amp)
y = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
n = jnp.asarray(N, jnp.int32)
ml = jax.jit(lambda K, y: mll_ops.gp_mll(K, y, n))
timeit("gp_mll given K", lambda: ml(K, y))
full = jax.jit(lambda x, m, l, a: mll_ops.gp_mll(kr.gram_masked("rbf", x, m, l, a, 1e-2), y, n))
timeit("gram+mll fused", lambda: full(x, mask, ls, amp))
fg = jax.jit(jax.value_and_grad(lambda l: mll_ops.gp_mll(kr.gram_masked("rbf", x, mask, l, amp, 1e-2), y, n)))
timeit("valgrad(gram+mll)", lambda: fg(ls)[0])
