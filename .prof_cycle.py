import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.acquisition import _wip_sweep_core
from bobe_tpu.models import gp as gpm
from bobe_tpu import config as _config

rng = np.random.default_rng(0)
N, D, NMC = 1024, 8, 64
x = rng.uniform(size=(N, D))
y = -0.5*np.sum(((x-0.5)/0.2)**2, 1) + 0.01*rng.normal(size=N)
gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
lp0 = jnp.log(gp.get_hyperparams())
x0_extra = rng.uniform(np.log(0.05), np.log(3.0), size=(3, D+1))
x0 = jnp.asarray(np.vstack([np.asarray(lp0)[None,:], x0_extra]))
mc = jnp.asarray(rng.uniform(size=(NMC, D)))

fit = gpm._fit_core(gp.cfg, D, 30, "lbfgs", jnp.dtype(_config.compute_dtype()).name)
sweep = _wip_sweep_core(gp.cfg, True, "float64")

st, bl, bf = fit(gp.state, x0); st.chol.block_until_ready()
acq, V, var = sweep(st, mc); acq.block_until_ready()

t0=time.time()
for _ in range(5):
    st2, bl, bf = fit(gp.state, x0)
st2.chol.block_until_ready()
print(f"fit: {(time.time()-t0)/5:.3f} s")
t0=time.time()
for _ in range(5):
    acq, V, var = sweep(st2, mc)
acq.block_until_ready()
print(f"sweep: {(time.time()-t0)/5:.3f} s")
