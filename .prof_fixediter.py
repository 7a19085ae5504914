import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.models import gp as gpm
from bobe_tpu.ops import optimize as opt_ops
from bobe_tpu.ops import kernels as kr

rng = np.random.default_rng(0)
N, D = 1024, 8
x = rng.uniform(size=(N, D))
y = -0.5*np.sum(((x-0.5)/0.2)**2, 1) + 0.01*rng.normal(size=N)
gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
lp0 = jnp.log(gp.get_hyperparams())
x0_extra = rng.uniform(np.log(0.05), np.log(3.0), size=(3, D+1))
x0 = jnp.asarray(np.vstack([np.asarray(lp0)[None,:], x0_extra]))
bounds = gpm.hyperparam_bounds_log(gp.cfg, D)
st32 = gpm._cast_state(gp.state, jnp.float32)
MI = 20

def bench(name, jitted, *args):
    jitted(*args)[1].block_until_ready()
    t0=time.time()
    for _ in range(5): r = jitted(*args)
    r[1].block_until_ready()
    print(f"{name}: {(time.time()-t0)/5:.3f} s ({(time.time()-t0)/5/MI*1e3:.1f} ms/iter) best={float(r[1]):.3f}")

# fixed 20 iterations, no early exit (patience > maxiter, gtol 0)
kw = dict(bounds=bounds, method="lbfgs", maxiter=MI, patience=10**6, gtol=0.0)

o_const = lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)
bench("const-state", jax.jit(lambda x0: opt_ops.minimize_restarts(o_const, x0, **kw)), x0)

def run_arg(stf, x0):
    o = lambda lp: gpm.neg_mll(stf, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)
    return opt_ops.minimize_restarts(o, x0, **kw)
bench("arg-state", jax.jit(run_arg), st32, x0)

dsq = kr.sq_dist_perdim(st32.x)
def run_pd(stf, dsq, x0):
    o = lambda lp: gpm.neg_mll(stf, gp.cfg, lp.astype(jnp.float32), dsq_perdim=dsq).astype(jnp.float64)
    return opt_ops.minimize_restarts(o, x0, **kw)
bench("arg-state perdim", jax.jit(run_pd), st32, dsq, x0)
