"""CamSpec-like 15-parameter synthetic parity run with ANALYTIC logZ.

The reference's largest cosmology configurations sample 15-16 parameters
(LCDM+Omk with the CamSpec likelihood and CPL+Omk with nuisance parameters;
reference docs/source/index.rst:28-29 and examples/Planck_lite_BAO_SN_CPL_Omk.py:41-56,
1500-eval budget, batch 4). Those runs need the Cobaya/CAMB stack; this is
the same regime — 6 curved-degenerate cosmology-scaled parameters plus 9
Gaussian nuisance-like parameters and a hard "theory code failed" region —
with the evidence known exactly (bobe_tpu/models/toys.make_planck_like at
d=15), so |dlogZ| <= 0.1 is asserted against truth.
"""
import os

import numpy as np

from bobe_tpu import BOBE
from bobe_tpu.models.toys import make_planck_like, planck_like_ref_draws


def main(max_evals=1500, seed=3):
    loglike, bounds, names, logz_true = make_planck_like(d=15)
    rng = np.random.default_rng(seed)
    ref_x, ref_y = planck_like_ref_draws(loglike, bounds, 12, rng)
    bobe = BOBE(
        loglikelihood=loglike,
        param_list=names,
        param_bounds=bounds,
        n_sobol_init=96,
        n_cobaya_init=0,
        init_train_x=ref_x,
        init_train_y=ref_y,
        use_clf=True,
        clf_type="svm",
        seed=seed,
        save=False,
        verbosity="INFO",
        # BOBE_TPU_EX_WARP=1 enables Kumaraswamy input warping for A/B runs
        # (curved cosmology degeneracies are the warp's target regime; see
        # BENCH_NOTES "Input warping A/B")
        gp_kwargs=({"input_warp": True}
                   if os.environ.get("BOBE_TPU_EX_WARP") == "1" else None),
    )
    results = bobe.run(
        acq="wipstd", min_evals=240, max_evals=max_evals, max_gp_size=900,
        logz_threshold=0.05, fit_n_points=12, batch_size=4, ns_n_points=16,
        convergence_n_iters=2, mc_points_size=128, do_final_ns=True,
    )
    logz = results["logz"]
    err = abs(logz["mean"] - logz_true)
    n_evals = int(bobe.gp.clf_data_size if hasattr(bobe.gp, "clf_data_size")
                  else bobe.gp.npoints)
    print(f"logZ = {logz['mean']:.4f}  truth = {logz_true:.4f}  "
          f"|dlogZ| = {err:.4f}  (target <= 0.1), "
          f"err_total = {logz.get('err_total', float('nan')):.4f}  "
          f"[sampler {logz.get('dlogz_sampler', float('nan')):.4f}, "
          f"hyp {logz.get('dlogz_hyp', float('nan')):.4f}], "
          f"true evals = {n_evals}")
    return err, results


if __name__ == "__main__":
    import sys

    kw = {}
    for a in sys.argv[1:]:
        k, sep, v = a.partition("=")
        if not sep or k not in ("max_evals", "seed") or not v.isdigit():
            sys.exit(f"usage: {sys.argv[0]} [max_evals=N] [seed=N]")
        kw[k] = int(v)
    main(**kw)
