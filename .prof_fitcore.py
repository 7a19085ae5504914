import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.models import gp as gpm

rng = np.random.default_rng(0)
N, D = 1024, 8
x = rng.uniform(size=(N, D))
y = -0.5*np.sum(((x-0.5)/0.2)**2, 1) + 0.01*rng.normal(size=N)
gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
lp0 = jnp.log(gp.get_hyperparams())
x0_extra = rng.uniform(np.log(0.05), np.log(3.0), size=(3, D+1))
x0 = jnp.asarray(np.vstack([np.asarray(lp0)[None,:], x0_extra]))

fit = gpm._fit_core(gp.cfg, D, 30, "lbfgs", "float32")
fit(gp.state, x0)[0].x.block_until_ready()
t0=time.time()
for _ in range(5):
    s, bl, bf = fit(gp.state, x0)
s.chol.block_until_ready()
print(f"_fit_core f32 (incl. f64 refresh): {(time.time()-t0)/5:.3f} s best={float(bf):.3f}")

from bobe_tpu.ops import optimize as opt_ops
bounds = gpm.hyperparam_bounds_log(gp.cfg, D)
st32 = gpm._cast_state(gp.state, jnp.float32)
obj = lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)
run = jax.jit(lambda x0: opt_ops.minimize_restarts(obj, x0, bounds=bounds, method="lbfgs", maxiter=30))
run(x0)[1].block_until_ready()
t0=time.time()
for _ in range(5): bx, bf = run(x0)
bf.block_until_ready()
print(f"bare minimize_restarts defaults: {(time.time()-t0)/5:.3f} s best={float(bf):.3f}")

# and with the cast inside the jit (as _fit_core does)
def run2(state, x0):
    stf = gpm._cast_state(state, jnp.float32)
    o = lambda lp: gpm.neg_mll(stf, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)
    return opt_ops.minimize_restarts(o, x0, bounds=bounds, method="lbfgs", maxiter=30)
run2j = jax.jit(run2)
run2j(gp.state, x0)[1].block_until_ready()
t0=time.time()
for _ in range(5): bx, bf = run2j(gp.state, x0)
bf.block_until_ready()
print(f"minimize_restarts w/ inside-cast: {(time.time()-t0)/5:.3f} s best={float(bf):.3f}")
