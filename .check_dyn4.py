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

for nl in (150, 200, 250, 300):
    ds, ss = [], []
    for seed in range(4):
        rd = run_nested_dynamic(apply_fn, None, D, jax.random.PRNGKey(seed), nlive=nl, dlogz=0.05, rng=np.random.default_rng(seed))
        rs = run_nested(apply_fn, None, D, jax.random.PRNGKey(seed+100), nlive=2*nl, dlogz=0.05, rng=np.random.default_rng(seed))
        ds.append(lz(rd)-TRUTH); ss.append(lz(rs)-TRUTH)
    print(f"nlive {nl}: dyn signed {np.round(ds,3)} mean {np.mean(ds):+.4f} | "
          f"static signed {np.round(ss,3)} mean {np.mean(ss):+.4f}")
