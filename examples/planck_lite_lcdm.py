"""Planck-lite LCDM (6 cosmological parameters) via Cobaya.

Counterpart of the reference cosmology example (examples/Planck_lite_LCDM.py):
expensive CPU likelihood (CAMB + Planck-lite, ~0.5-1 s/eval) farmed to the
host-side evaluation pool while all GP/sampler math runs on the TPU. Uses the
classifier-gated GP to model the hard prior/failure boundaries.

Requires the optional cosmology stack (cobaya + camb + planck likelihoods);
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
              "(pip install cobaya camb) and the Planck likelihood data "
              "to run this example.")
        sys.exit(0)

    yaml_path = os.path.join(os.path.dirname(__file__), "cosmo_input",
                             "LCDM_lite.yaml")
    bobe = BOBE(
        loglikelihood=yaml_path,  # YAML path, text, or info dict all work
        likelihood_name="planck_lite_lcdm",
        n_sobol_init=32,
        n_cobaya_init=8,
        use_clf=True,
        clf_type="svm",
        seed=10,
        save_dir="./results/",
        pool="multiprocess",  # parallel CAMB evaluations on host cores
    )
    results = bobe.run(
        acq="wipstd", min_evals=100, max_evals=500, max_gp_size=600,
        logz_threshold=0.02, fit_n_points=8, batch_size=4, ns_n_points=12,
        convergence_n_iters=2,
    )
    if results is None:
        return
    logz = results.get("logz", {})
    print(f"logZ = {logz.get('mean', float('nan')):.2f} (expected ~ -520, "
          f"reference docs cosmology.rst:278)")


if __name__ == "__main__":
    main()
