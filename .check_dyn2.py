import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import bobe_tpu
from bobe_tpu.infer.nested import run_nested, run_nested_dynamic, merge_runs
from bobe_tpu.infer import integrals
from scipy.stats import norm, chi2
from scipy.special import logsumexp

d, sigma = 4, 0.1
def apply_fn(ctx, x):
    return -0.5*jnp.sum(((x-0.5)/sigma)**2, -1) - 0.5*d*jnp.log(2*jnp.pi*sigma**2)
truth = float(d*np.log(norm.cdf(0.5/sigma)-norm.cdf(-0.5/sigma)))

key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
base = run_nested(apply_fn, None, d, key, nlive=250, dlogz=0.01, rng=rng)
lw = integrals.logwt_from(base.dead_logl, base.logvol)
print("base own logz:", float(logsumexp(lw)), "truth:", truth)

# single-run merge consistency
xs, ls, lv = merge_runs([(base.dead_x, base.dead_logl, base.nlive_schedule, -np.inf)])
lw2 = integrals.logwt_from(ls, lv)
print("single-run merged logz:", float(logsumexp(lw2)))
print("logvol diff at mid:", float(lv[len(lv)//2] - np.sort(base.logvol)[::-1][len(lv)//2]))

# now the dynamic pieces
res = run_nested_dynamic(apply_fn, None, d, jax.random.PRNGKey(1), nlive=250,
                         dlogz=0.01, rng=np.random.default_rng(1))
lwd = integrals.logwt_from(res.dead_logl, res.logvol)
print("dynamic merged logz:", float(logsumexp(lwd)))

# batch-only diagnostic: what logz does a run seeded in the bulk report,
# and what SHOULD the mass above l_lo be? Reconstruct l_lo like the impl:
logwt = integrals.logwt_from(base.dead_logl, base.logvol)
keep = logwt >= logwt.max() + np.log(0.01)
l_lo = float(base.dead_logl[np.argmax(keep)])
# analytic mass above l_lo: for the gaussian, L(x)>l_lo is a chi2_d ball
lmax = float(-0.5*d*np.log(2*np.pi*sigma**2))
r2 = 2.0*(lmax - l_lo)
mass_above = float(chi2.cdf(r2, df=d)) * (2*np.pi)**(d/2) * sigma**d  # vol integral of L>l_lo region... 
# simpler: Z restricted = int_{L>l_lo} L dx; compute by 1e6-sample MC in u-space
u = np.random.default_rng(9).normal(size=(1000000, d)) * sigma
Lvals = -0.5*np.sum((u/sigma)**2, -1) + lmax
Zrestrict = np.log(np.mean(Lvals > l_lo))  # fraction of gaussian mass above cut
print(f"l_lo={l_lo:.2f}, analytic log-mass above cut: {Zrestrict:.4f}")
