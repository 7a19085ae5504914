import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import bobe_tpu
from bobe_tpu.infer.nested import run_nested, run_nested_dynamic
from bobe_tpu.infer import integrals
from scipy.special import logsumexp
from scipy.stats import norm

D, SIGMA = 4, 0.1
TRUTH = float(D*np.log(norm.cdf(0.5/SIGMA)-norm.cdf(-0.5/SIGMA)))
def apply_fn(ctx, x):
    return -0.5*jnp.sum(((x-0.5)/SIGMA)**2, -1) - 0.5*D*jnp.log(2*jnp.pi*SIGMA**2)
def lz(res):
    return float(logsumexp(integrals.logwt_from(res.dead_logl, res.logvol)))

t0=time.time()
de, se, dc, sc = [], [], [], []
for seed in range(4):
    rd = run_nested_dynamic(apply_fn, None, D, jax.random.PRNGKey(seed), nlive=200, dlogz=0.05, rng=np.random.default_rng(seed))
    rs = run_nested(apply_fn, None, D, jax.random.PRNGKey(seed+100), nlive=400, dlogz=0.05, rng=np.random.default_rng(seed))
    de.append(abs(lz(rd)-TRUTH)); se.append(abs(lz(rs)-TRUTH))
    dc.append(rd.n_calls); sc.append(rs.n_calls)
    print(f"seed {seed}: dyn {de[-1]:.4f} ({dc[-1]}) static {se[-1]:.4f} ({sc[-1]})")
print(f"mean dyn {np.mean(de):.4f} static {np.mean(se):.4f}; calls {np.mean(dc):.0f} vs {np.mean(sc):.0f}; wall {time.time()-t0:.0f}s")
