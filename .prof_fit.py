import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.models import gp as gpm
from bobe_tpu import config as cfgmod

rng = np.random.default_rng(0)
N, D = 1024, 8
x = rng.uniform(size=(N, D))
y = -0.5*np.sum(((x-0.5)/0.2)**2, 1) + 0.01*rng.normal(size=N)
gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
st32 = gpm._cast_state(gp.state, jnp.float32)

# 1. single neg_mll eval f32
f = jax.jit(lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32)))
vg = jax.jit(jax.value_and_grad(lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)))
lp0 = jnp.log(gp.get_hyperparams())
f(lp0).block_until_ready(); vg(lp0)[0].block_until_ready()
for name, fn in [("mll_value_f32", lambda: f(lp0)), ("mll_valgrad_f32", lambda: vg(lp0)[0])]:
    t0=time.time()
    for _ in range(20): r = fn()
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/20*1e3:.2f} ms")

# vmapped over 4 restarts
lp4 = jnp.tile(lp0[None,:], (4,1)) + 0.1*jnp.arange(4)[:,None]
vg4 = jax.jit(jax.vmap(lambda lp: jax.value_and_grad(lambda q: gpm.neg_mll(st32, gp.cfg, q.astype(jnp.float32)).astype(jnp.float64))(lp)))
vg4(lp4)[0].block_until_ready()
t0=time.time()
for _ in range(20): r = vg4(lp4)[0]
r.block_until_ready()
print(f"mll_valgrad_f32 x4 vmapped: {(time.time()-t0)/20*1e3:.2f} ms")

# 2. current production fit
x0_extra = rng.uniform(np.log(0.05), np.log(3.0), size=(3, D+1))
x0 = jnp.asarray(np.vstack([np.asarray(lp0)[None,:], x0_extra]))
for mi in (30,):
    fit = gpm._fit_core(gp.cfg, D, mi, "lbfgs", "float32")
    fit(gp.state, x0)[0].x.block_until_ready()
    t0=time.time(); s,_,bf = fit(gp.state, x0); s.x.block_until_ready()
    print(f"fit maxiter={mi}: {time.time()-t0:.3f} s  best_f={float(bf):.2f}")
