import time, itertools
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
dsq = kr.sq_dist_perdim(st32.x)
obj = lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32), dsq_perdim=dsq).astype(jnp.float64)
# scipy quality anchor: -52.566
for bt, df, pat in [(8,0.8,4), (4,0.5,4), (3,0.5,4), (2,0.33,4), (4,0.5,6)]:
    run = jax.jit(lambda x0, bt=bt, df=df, pat=pat: opt_ops.minimize_restarts(
        obj, x0, bounds=bounds, method="lbfgs", maxiter=40, patience=pat,
        decrease_factor=df, max_backtracking_steps=bt))
    run(x0)[1].block_until_ready()
    t0=time.time()
    for _ in range(5): bx, bf = run(x0)
    bf.block_until_ready()
    print(f"bt={bt} df={df} pat={pat}: {(time.time()-t0)/5:.3f} s best={float(bf):.3f}")
