import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.models import gp as gpm
from bobe_tpu.ops import chol as chol_ops
from bobe_tpu.ops import kernels as kr
from bobe_tpu.acquisition import _wip_sweep_core

rng = np.random.default_rng(0)
N, D = 1024, 8
x = rng.uniform(size=(N, D))
y = -0.5*np.sum(((x-0.5)/0.2)**2, 1) + 0.01*rng.normal(size=N)
gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
st = gp.state

def timeit(name, fn, reps=10):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(reps): r = fn()
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/reps*1e3:.2f} ms")

mask = st.mask(); ls = jnp.exp(st.log_ls); amp = jnp.exp(st.log_amp)
g = jax.jit(lambda: kr.gram_masked("rbf", st.x, mask, ls, amp, gp.cfg.noise))
timeit("gram f64", g)
K = g()
cj = jax.jit(lambda K: chol_ops.cholesky_jittered(K, mask, amp))
timeit("chol_jittered f64", lambda: cj(K))
L = cj(K)
cs = jax.jit(lambda L: chol_ops.cho_solve(L, st.y_raw))
timeit("cho_solve f64 1rhs", lambda: cs(L))
rf = jax.jit(lambda s: gpm.refresh(s, gp.cfg), static_argnums=())
rfj = jax.jit(gpm.refresh, static_argnums=1)
timeit("refresh full f64", lambda: rfj(st, gp.cfg).chol)
sweep = _wip_sweep_core(gp.cfg, True, "float64")
mc = jnp.asarray(rng.uniform(size=(64, D)))
timeit("wip sweep f64 64mc", lambda: sweep(st, mc)[0])
sweep32 = _wip_sweep_core(gp.cfg, True, "float32")
timeit("wip sweep f32 64mc", lambda: sweep32(st, mc)[0])
