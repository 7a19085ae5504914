import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.models import gp as gpm
from bobe_tpu.ops import optimize as opt_ops

rng = np.random.default_rng(0)
N, D = 1024, 8
x = rng.uniform(size=(N, D))
y = -0.5*np.sum(((x-0.5)/0.2)**2, 1) + 0.01*rng.normal(size=N)
gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
lp0 = jnp.log(gp.get_hyperparams())
x0_extra = rng.uniform(np.log(0.05), np.log(3.0), size=(3, D+1))
x0 = jnp.asarray(np.vstack([np.asarray(lp0)[None,:], x0_extra]))
bounds = gpm.hyperparam_bounds_log(gp.cfg, D)

def bench(name, jitted, *args):
    jitted(*args)[1].block_until_ready()
    t0=time.time()
    for _ in range(5): r = jitted(*args)
    r[1].block_until_ready()
    print(f"{name}: {(time.time()-t0)/5:.3f} s best={float(r[1]):.3f}")

st32 = gpm._cast_state(gp.state, jnp.float32)

# A: f32 state as jit ARGUMENT
def runA(state_f, x0):
    o = lambda lp: gpm.neg_mll(state_f, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)
    return opt_ops.minimize_restarts(o, x0, bounds=bounds, method="lbfgs", maxiter=30)
bench("A f32-state-as-arg", jax.jit(runA), st32, x0)

# B: f64 state arg, cast inside + barrier
def runB(state, x0):
    stf = jax.lax.optimization_barrier(gpm._cast_state(state, jnp.float32))
    o = lambda lp: gpm.neg_mll(stf, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)
    return opt_ops.minimize_restarts(o, x0, bounds=bounds, method="lbfgs", maxiter=30)
bench("B inside-cast+barrier", jax.jit(runB), gp.state, x0)
