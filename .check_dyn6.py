import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import bobe_tpu
from bobe_tpu.infer.nested import run_nested, run_nested_dynamic
from bobe_tpu.infer import integrals
from scipy.special import logsumexp
from scipy.stats import norm

D, SIGMA = 4, 0.02
TRUTH = float(D*np.log(norm.cdf(0.5/SIGMA)-norm.cdf(-0.5/SIGMA)))
def apply_fn(ctx, x):
    return -0.5*jnp.sum(((x-0.5)/SIGMA)**2, -1) - 0.5*D*jnp.log(2*jnp.pi*SIGMA**2)
def stats(res):
    lw = integrals.logwt_from(res.dead_logl, res.logvol)
    w = np.exp(lw - logsumexp(lw))
    return float(logsumexp(lw)), float(1.0/np.sum(w**2))

for nl_s in (500,):
    es, errs = [], []
    for seed in range(3):
        r = run_nested(apply_fn, None, D, jax.random.PRNGKey(seed+100), nlive=nl_s, dlogz=0.05, rng=np.random.default_rng(seed))
        lz, ess = stats(r)
        es.append(ess/r.n_calls*1000); errs.append(abs(lz-TRUTH))
    print(f"static nlive={nl_s}: err {np.round(errs,3)} ESS/kcall {np.round(es,2)} calls~{r.n_calls}")
es, errs, cc = [], [], []
for seed in range(3):
    r = run_nested_dynamic(apply_fn, None, D, jax.random.PRNGKey(seed), nlive=250, dlogz=0.05, rng=np.random.default_rng(seed))
    lz, ess = stats(r)
    es.append(ess/r.n_calls*1000); errs.append(abs(lz-TRUTH)); cc.append(r.n_calls)
print(f"dynamic nlive=250+250: err {np.round(errs,3)} ESS/kcall {np.round(es,2)} calls {cc}")
