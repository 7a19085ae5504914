import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import bobe_tpu
from bobe_tpu.infer.nested import run_nested, run_nested_dynamic, merge_runs
from bobe_tpu.infer import integrals
from scipy.stats import norm
from scipy.special import logsumexp

d, sigma = 4, 0.1
mass = (norm.cdf(0.5/sigma) - norm.cdf(-0.5/sigma))**d
truth = float(np.log(mass))  # ~0
def apply_fn(ctx, x):
    return -0.5*jnp.sum(((x-0.5)/sigma)**2, -1) - 0.5*d*jnp.log(2*jnp.pi*sigma**2)

def logz_of(res):
    lw = integrals.logwt_from(res.dead_logl, res.logvol)
    return float(logsumexp(lw))

for seed in range(3):
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    r_dyn = run_nested_dynamic(apply_fn, None, d, key, nlive=250, dlogz=0.01, rng=rng)
    rng2 = np.random.default_rng(seed)
    r_sta = run_nested(apply_fn, None, d, key, nlive=500, dlogz=0.01, rng=rng2)
    print(f"seed {seed}: dyn logz={logz_of(r_dyn):+.4f} ({r_dyn.n_calls} calls, {len(r_dyn.dead_logl)} pts) | "
          f"static logz={logz_of(r_sta):+.4f} ({r_sta.n_calls} calls, {len(r_sta.dead_logl)} pts) | truth {truth:+.4f}")

# merge-of-two-independent-full-runs sanity: error shrinks
key1, key2 = jax.random.PRNGKey(10), jax.random.PRNGKey(11)
r1 = run_nested(apply_fn, None, d, key1, nlive=250, dlogz=0.01, rng=np.random.default_rng(1))
r2 = run_nested(apply_fn, None, d, key2, nlive=250, dlogz=0.01, rng=np.random.default_rng(2))
xs, ls, lv = merge_runs([(r1.dead_x, r1.dead_logl, r1.nlive_schedule, -np.inf),
                         (r2.dead_x, r2.dead_logl, r2.nlive_schedule, -np.inf)])
lw = integrals.logwt_from(ls, lv)
print(f"merge two full runs: logz={float(logsumexp(lw)):+.4f} "
      f"(r1 {logz_of(r1):+.4f}, r2 {logz_of(r2):+.4f}, truth {truth:+.4f})")
