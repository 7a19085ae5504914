import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.models import gp as gpm
from bobe_tpu.ops import kernels as kr
from bobe_tpu.ops import optimize as opt_ops

rng = np.random.default_rng(0)
N, D = 1024, 8
x = rng.uniform(size=(N, D))
y = -0.5*np.sum(((x-0.5)/0.2)**2, 1) + 0.01*rng.normal(size=N)
gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
st32 = gpm._cast_state(gp.state, jnp.float32)
lp0 = jnp.log(gp.get_hyperparams())
lps = jnp.vstack([lp0[None,:], lp0[None,:]+0.3, lp0[None,:]-0.3])
dsq = kr.sq_dist_perdim(st32.x)
f64 = jax.jit(jax.vmap(lambda lp: gpm.neg_mll(gp.state, gp.cfg, lp)))
f32p = jax.jit(jax.vmap(lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32))))
f32d = jax.jit(jax.vmap(lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32), dsq_perdim=dsq)))
print("f64 oracle :", np.asarray(f64(lps)))
print("f32 plain  :", np.asarray(f32p(lps)))
print("f32 perdim :", np.asarray(f32d(lps)))

# fit with each and compare the final f64 MLL of the selected hyperparams
bounds = gpm.hyperparam_bounds_log(gp.cfg, D)
x0_extra = rng.uniform(np.log(0.05), np.log(3.0), size=(3, D+1))
x0 = jnp.asarray(np.vstack([np.asarray(lp0)[None,:], x0_extra]))
for name, ob in [("plain", lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32)).astype(jnp.float64)),
                 ("perdim", lambda lp: gpm.neg_mll(st32, gp.cfg, lp.astype(jnp.float32), dsq_perdim=dsq).astype(jnp.float64))]:
    run = jax.jit(lambda x0, ob=ob: opt_ops.minimize_restarts(ob, x0, bounds=bounds, method="lbfgs", maxiter=40, patience=4))
    bx, bf = run(x0)
    v64 = float(gpm.neg_mll(gp.state, gp.cfg, jnp.log(bx)))
    print(f"{name}: f32-selected best_f={float(bf):.3f} -> f64 oracle at selection: {v64:.3f}")
