import time, itertools
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
st32 = gpm._cast_state(gp.state, jnp.float32)
obj = lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)

# scipy oracle quality (uses f64 state as production does on CPU? use f32 objective for apples-to-apples)
t0=time.time()
bx, bf = opt_ops.minimize_scipy_restarts(obj, np.asarray(x0), bounds=bounds, maxiter=30)
print(f"scipy oracle: {time.time()-t0:.2f} s best_f={float(bf):.3f}")

for df, bt, pat in itertools.product((0.5, 0.8), (8, 12), (4, 10)):
    run = jax.jit(lambda x0, df=df, bt=bt, pat=pat: opt_ops.minimize_restarts(
        obj, x0, bounds=bounds, method="lbfgs", maxiter=30, patience=pat,
        decrease_factor=df, max_backtracking_steps=bt))
    bx, bf = run(x0); bf.block_until_ready()
    t0 = time.time()
    for _ in range(3):
        bx, bf = run(x0)
    bf.block_until_ready()
    print(f"df={df} bt={bt} pat={pat}: {(time.time()-t0)/3:.3f} s  best_f={float(bf):.3f}")
