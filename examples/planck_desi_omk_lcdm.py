"""Planck (CamSpec) + DESI DR2 BAO, LCDM + Omega_K — 16 sampled parameters.

Counterpart of the reference's 16-dimensional curvature run
(examples/Planck_DESI_Omk_LCDM.py) — the largest case in its documented
dimensionality envelope (docs index.rst:28-29). Same stack as the flat run
plus a sampled Omega_K.

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
                             "planck_desi_omk_lcdm.yaml")
    bobe = BOBE(
        loglikelihood=open(yaml_path).read(),
        likelihood_name="planck_desi_omk_lcdm",
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
        acq="wipstd", min_evals=750, max_evals=2500, max_gp_size=1500,
        logz_threshold=0.25, fit_n_points=10, batch_size=5, ns_n_points=10,
        num_hmc_samples=4096, mc_points_size=512,
        convergence_n_iters=2, do_final_ns=True,
    )
    if results is None:
        return
    logz = results.get("logz", {})
    print(f"logZ = {logz.get('mean', float('nan')):.2f} "
          f"[{logz.get('lower', float('nan')):.2f}, "
          f"{logz.get('upper', float('nan')):.2f}]")


if __name__ == "__main__":
    main()
