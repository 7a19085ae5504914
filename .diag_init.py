import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from bobe_tpu import BOBE
from bobe_tpu.models.toys import make_planck_like

loglike, bounds, names, logz_true = make_planck_like()
bobe = BOBE(loglikelihood=loglike, param_list=names, param_bounds=bounds,
            n_sobol_init=48, n_cobaya_init=0, use_clf=True,
            clf_type="svm", seed=3, save=False, verbosity="WARNING")
gp = bobe.gp
print("npoints:", gp.npoints, "clf:", gp.clf_data_size)
yr = np.asarray(gp.train_y_raw)
print("train_y_raw: min", yr.min(), "max", yr.max(), "n_minus_inf:", np.sum(yr < -1e8))
yc = np.asarray(gp.train_y_clf).reshape(-1)
print("clf y: min", yc.min(), "max", yc.max(), "n_fail:", np.sum(yc < -1e8))
# true loglike stats on the sobol points
from bobe_tpu.utils.core import scale_from_unit
X = scale_from_unit(np.asarray(gp.train_x_clf), bounds)
tv = []
for x in X:
    try: tv.append(loglike(x))
    except RuntimeError: tv.append(-1e10)
tv = np.array(tv)
print("true at clf points: max", tv.max(), "n_fail:", (tv<-1e8).sum(), "/", len(tv))
