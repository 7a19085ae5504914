"""Ring-shaped degeneracy; stresses the GP with a large training set
(Cholesky growth to hundreds of points) and the classifier path."""
import os

# cheap analytic toy: wall-clock matters more than true-evaluation count, so
# select the fast f32+polish fit path on TPU (docs/detailed_usage.md,
# "Precision policy"; the cosmology-regime default is exact f64 fits)
os.environ.setdefault("BOBE_TPU_F64_FIT_MAX_CAP", "0")

from bobe_tpu import BOBE
from bobe_tpu.models import toys


def main():
    bobe = BOBE(
        loglikelihood=toys.gaussian_ring,
        param_list=["x1", "x2"],
        param_bounds=toys.gaussian_ring_bounds,
        likelihood_name="gaussian_ring",
        n_sobol_init=64,
        seed=3,
        save_dir="./results/",
    )
    results = bobe.run(
        acq="wipstd", min_evals=120, max_evals=900, max_gp_size=1000,
        logz_threshold=2e-2, fit_n_points=8, batch_size=4, ns_n_points=12,
        convergence_n_iters=2,
    )
    if results is None:
        return
    logz = results.get("logz", {})
    print(f"logZ = {logz.get('mean', float('nan')):.4f}")


if __name__ == "__main__":
    main()
