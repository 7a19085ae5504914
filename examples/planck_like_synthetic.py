"""Synthetic planck-like parity run: 6 curved-degenerate parameters with a
hard failure region and ANALYTIC logZ.

This is the cosmology-regime validation that does not need the Cobaya/CAMB
stack: the likelihood has the reference cosmology runs' structure (6 params,
~5%-of-prior posterior widths, correlated curved degeneracies, a hard
"theory code failed" region handled by the classifier-GP — reference
docs/source/examples/cosmology.rst:278) but its evidence is known exactly
(bobe_tpu/models/toys.make_planck_like), so |dlogZ| <= 0.1 can be asserted
against truth rather than against another sampler.
"""
import os

import numpy as np

from bobe_tpu import BOBE
from bobe_tpu.models.toys import make_planck_like, planck_like_ref_draws


def main(max_evals=500, seed=3):
    loglike, bounds, names, logz_true = make_planck_like()
    # reference-distribution seeding, as the cosmology runs do via the
    # Cobaya YAML ref dists (8 draws from a broadened posterior shape)
    rng = np.random.default_rng(seed)
    ref_x, ref_y = planck_like_ref_draws(loglike, bounds, 8, rng)
    bobe = BOBE(
        loglikelihood=loglike,
        param_list=names,
        param_bounds=bounds,
        n_sobol_init=48,
        n_cobaya_init=0,
        init_train_x=ref_x,
        init_train_y=ref_y,
        use_clf=True,
        clf_type="svm",
        seed=seed,
        save=False,
        verbosity="INFO",
        # BOBE_TPU_EX_WARP=1 enables Kumaraswamy input warping for A/B runs
        gp_kwargs=({"input_warp": True}
                   if os.environ.get("BOBE_TPU_EX_WARP") == "1" else None),
    )
    results = bobe.run(
        acq="wipstd", min_evals=120, max_evals=max_evals, max_gp_size=600,
        logz_threshold=0.05, fit_n_points=8, batch_size=4, ns_n_points=12,
        convergence_n_iters=2, do_final_ns=True,
    )
    logz = results["logz"]
    err = abs(logz["mean"] - logz_true)
    n_evals = int(bobe.gp.clf_data_size if hasattr(bobe.gp, "clf_data_size")
                  else bobe.gp.npoints)
    print(f"logZ = {logz['mean']:.4f}  truth = {logz_true:.4f}  "
          f"|dlogZ| = {err:.4f}  (target <= 0.1), "
          f"true evals = {n_evals}")
    return err, results


if __name__ == "__main__":
    main()
