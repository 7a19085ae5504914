"""Himmelblau 2-D multimodal toy with batched acquisition (batch_size=4).

True logZ = -5.504 on [-5, 5]^2 (brute-force quadrature; the reference docs
quote ~ -3.2, detailed_usage.rst:197, which does not match the integral).
Round-3 measured multi-seed |dlogZ| <= 0.076 via mode-balanced acquisition
+ the final-precision NS pass (BENCH_NOTES).
"""
import os

# cheap analytic toy: wall-clock matters more than true-evaluation count, so
# select the fast f32+polish fit path on TPU (docs/detailed_usage.md,
# "Precision policy"; the cosmology-regime default is exact f64 fits)
os.environ.setdefault("BOBE_TPU_F64_FIT_MAX_CAP", "0")

import time

from bobe_tpu import BOBE
from bobe_tpu.models import toys


def main():
    start = time.time()
    bobe = BOBE(
        loglikelihood=toys.himmelblau,
        param_list=toys.himmelblau_names,
        param_bounds=toys.himmelblau_bounds,
        likelihood_name="himmelblau",
        n_sobol_init=32,
        seed=1,
        save_dir="./results/",
    )
    results = bobe.run(
        acq="wipstd", min_evals=60, max_evals=400, max_gp_size=400,
        logz_threshold=2e-2, fit_n_points=4, batch_size=4, ns_n_points=8,
        convergence_n_iters=2, mc_points_size=256,
    )
    if results is None:
        return
    logz = results.get("logz", {})
    print(f"logZ = {logz.get('mean', float('nan')):.4f} "
          f"(brute-force truth -5.504); wall {time.time() - start:.1f}s")


if __name__ == "__main__":
    main()
