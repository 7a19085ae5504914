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

def stats(res):
    lw = integrals.logwt_from(res.dead_logl, res.logvol)
    w = np.exp(lw - logsumexp(lw))
    ess = 1.0 / np.sum(w**2)
    return float(logsumexp(lw)), ess

for seed in range(3):
    rd = run_nested_dynamic(apply_fn, None, D, jax.random.PRNGKey(seed), nlive=250, dlogz=0.05, rng=np.random.default_rng(seed))
    rs = run_nested(apply_fn, None, D, jax.random.PRNGKey(seed+100), nlive=500, dlogz=0.05, rng=np.random.default_rng(seed))
    lzd, essd = stats(rd); lzs, esss = stats(rs)
    print(f"seed {seed}: dyn lz_err {abs(lzd-TRUTH):.3f} ESS {essd:.0f} calls {rd.n_calls} "
          f"(ESS/1kcall {1000*essd/rd.n_calls:.2f}) | "
          f"static lz_err {abs(lzs-TRUTH):.3f} ESS {esss:.0f} calls {rs.n_calls} "
          f"(ESS/1kcall {1000*esss/rs.n_calls:.2f})")
