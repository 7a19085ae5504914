"""Optimization-only mode: LogEI on the Rosenbrock valley (no logZ/samples)."""
import os

# cheap analytic toy: wall-clock matters more than true-evaluation count, so
# select the fast f32+polish fit path on TPU (docs/detailed_usage.md,
# "Precision policy"; the cosmology-regime default is exact f64 fits)
os.environ.setdefault("BOBE_TPU_F64_FIT_MAX_CAP", "0")

from bobe_tpu import BOBE
from bobe_tpu.models import toys


def main():
    bobe = BOBE(
        loglikelihood=toys.rosenbrock,
        param_list=toys.rosenbrock_names,
        param_bounds=toys.rosenbrock_bounds,
        likelihood_name="rosenbrock",
        n_sobol_init=16,
        seed=0,
        save_dir="./results/",
    )
    results = bobe.run(acq="logei", max_evals=120, max_gp_size=150,
                       ei_goal=1e-8, convergence_n_iters=2, zeta_ei=0.01)
    if results is None:
        return
    print(f"best point {results['best_pt']} value {results['best_val']:.6f} "
          f"(true optimum: [1, 1] -> 0)")


if __name__ == "__main__":
    main()
