import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from bobe_tpu import BOBE
from bobe_tpu.models.toys import make_planck_like
from bobe_tpu.samplers import _gp_loglike
from bobe_tpu.utils.core import scale_to_unit

loglike, bounds, names, logz_true = make_planck_like()
bobe = BOBE(loglikelihood=loglike, param_list=names, param_bounds=bounds,
            n_sobol_init=48, n_cobaya_init=0, use_clf=True,
            clf_type="svm", seed=3, save=False, verbosity="WARNING")
gp = bobe.gp
print("init: gp_size", gp.gp_size, "clf", gp.clf_data_size,
      "best raw", float(gp.train_y_raw.max()))
res = bobe.run(acq="wipstd", min_evals=60, max_evals=200, max_gp_size=400,
               logz_threshold=0.3, fit_n_points=8, batch_size=4,
               ns_n_points=12, convergence_n_iters=1, do_final_ns=True,
               mc_points_method="uniform", num_hmc_warmup=128,
               num_hmc_samples=128)
gp = bobe.gp
print("final: gp_size", gp.gp_size, "clf", gp.clf_data_size,
      "best raw", float(gp.train_y_raw.max()))
rng = np.random.default_rng(1)
U = rng.normal(size=(4000, 6)); U = U[U[:,1] <= loglike.c_fail][:1000]
X = np.array([loglike.unwarp(u) for u in U])
true_l = np.array([loglike(x) for x in X])
Xu = scale_to_unit(X, bounds)
apply_fn, ctx = _gp_loglike(gp)
pred = np.asarray(apply_fn(ctx, jnp.asarray(Xu)))
gated = pred < -1e4
print(f"posterior draws gated off: {gated.mean()*100:.1f}%")
if (~gated).sum():
    err = pred[~gated] - true_l[~gated]
    print(f"surrogate err on feasible: mean {err.mean():+.2f} sd {err.std():.2f}")
print("logz:", res.get("logz"), "truth:", logz_true)
