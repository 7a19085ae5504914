import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.models import gp as gpm
from bobe_tpu.ops import kernels as kr

rng = np.random.default_rng(0)
N, D = 1024, 8
x = rng.uniform(size=(N, D))
y = -0.5*np.sum(((x-0.5)/0.2)**2, 1) + 0.01*rng.normal(size=N)
gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
st32 = gpm._cast_state(gp.state, jnp.float32)
lp0 = jnp.log(gp.get_hyperparams())
lp4 = jnp.tile(lp0[None,:], (4,1)) + 0.1*jnp.arange(4)[:,None]
dsq = kr.sq_dist_perdim(st32.x)

def timeit(name, fn, reps=30):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn()
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/reps*1e3:.2f} ms")

f_plain = jax.jit(jax.vmap(jax.value_and_grad(
    lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64))))
timeit("valgrad x4 plain", lambda: f_plain(lp4)[0])
f_pd = jax.jit(jax.vmap(jax.value_and_grad(
    lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32), dsq_perdim=dsq).astype(jnp.float64))))
timeit("valgrad x4 perdim", lambda: f_pd(lp4)[0])
v1 = f_plain(lp4)[0]; v2 = f_pd(lp4)[0]
print("values plain:", np.asarray(v1))
print("values perdim:", np.asarray(v2))
