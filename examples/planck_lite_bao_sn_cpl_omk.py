"""Planck-lite + DESI BAO + Pantheon+ SNe, CPL + curvature — 9 parameters.

Counterpart of the reference's extended-dark-energy run
(examples/Planck_lite_BAO_SN_CPL_Omk.py): w0/wa (CPL) + Omega_K on top of
the 6 baseline parameters, constrained by Planck-lite + DESI DR2 BAO +
Pantheon+ supernovae. Budgets follow the reference script (1500-eval
budget, batch 4).

Requires the optional cosmology stack (cobaya + camb + Planck/DESI data);
exits with instructions when absent.
"""
import os
import sys

from bobe_tpu import BOBE


def main():
    try:
        import cobaya  # noqa: F401
    except ImportError:
        print("cobaya is not installed; install the cosmology stack "
              "(pip install cobaya camb) plus the Planck NPIPE CamSpec and "
              "DESI BAO data to run this example.")
        sys.exit(0)

    yaml_path = os.path.join(os.path.dirname(__file__), "cosmo_input",
                             "planck_lite_bao_sn_cpl_omk.yaml")
    bobe = BOBE(
        loglikelihood=open(yaml_path).read(),
        likelihood_name="planck_lite_bao_sn_cpl_omk",
        confidence_for_unbounded=0.9999995,
        n_sobol_init=32,
        n_cobaya_init=8,
        use_clf=True,
        clf_type="svm",
        gp_kwargs={"lengthscale_prior": None,
                   "lengthscale_bounds": (1e-2, 5.0)},
        seed=42,
        save_dir="./results/",
        pool="multiprocess",
    )
    results = bobe.run(
        acq="wipstd", min_evals=400, max_evals=1500, max_gp_size=900,
        logz_threshold=0.5, fit_n_points=20, batch_size=4, ns_n_points=20,
        num_hmc_samples=2000, mc_points_size=512,
        convergence_n_iters=1, do_final_ns=False,
    )
    if results is None:
        return
    logz = results.get("logz", {})
    print(f"logZ = {logz.get('mean', float('nan')):.2f} "
          f"[{logz.get('lower', float('nan')):.2f}, "
          f"{logz.get('upper', float('nan')):.2f}]")


if __name__ == "__main__":
    main()
