"""Quickstart: 2-D curved-degeneracy banana likelihood.

TPU-native counterpart of the reference quickstart (examples/Banana.py).
Runs the WIPStd evidence loop on the GP surrogate and prints logZ with
GP-uncertainty bounds plus the phase timing breakdown.
"""
import os

# cheap analytic toy: wall-clock matters more than true-evaluation count, so
# select the fast f32+polish fit path on TPU (docs/detailed_usage.md,
# "Precision policy"; the cosmology-regime default is exact f64 fits)
os.environ.setdefault("BOBE_TPU_F64_FIT_MAX_CAP", "0")

import time

import numpy as np

from bobe_tpu import BOBE
from bobe_tpu.models import toys


def main():
    start = time.time()
    bobe = BOBE(
        loglikelihood=toys.banana,
        param_list=toys.banana_names,
        param_labels=["x_1", "x_2"],
        param_bounds=toys.banana_bounds,
        likelihood_name="banana",
        n_sobol_init=8,
        seed=42,
        save_dir="./results/",
        # BOBE_TPU_EX_WARP=1 enables Kumaraswamy input warping (measured on
        # this toy: ~3x better |dlogZ|, ~40% tighter GP evidence bounds at
        # the cost of later convergence — BENCH_NOTES "Input warping A/B")
        gp_kwargs=({"input_warp": True}
                   if os.environ.get("BOBE_TPU_EX_WARP") == "1" else None),
    )
    results = bobe.run(
        acq="wipstd",
        min_evals=25,
        max_evals=250,
        max_gp_size=250,
        logz_threshold=5e-2,
        do_final_ns=True,
        fit_n_points=1,
        batch_size=1,
        ns_n_points=1,
        num_hmc_samples=2048,
        mc_points_size=512,
        convergence_n_iters=2,
    )
    if results is None:
        return

    logz = results.get("logz", {})
    print("=" * 60)
    print(f"Final logZ: {logz.get('mean', float('nan')):.4f}")
    if "upper" in logz:
        print(f"logZ uncertainty: +/-{(logz['upper'] - logz['lower']) / 2:.4f}")
    print(f"wall time: {time.time() - start:.1f}s")
    rm = results.get("results_manager")
    if rm is None:
        # device-server mode: the run executed on the server; timing +
        # plot artifacts are written server-side under save_dir
        print("(run executed on the device server; timing/plots are in "
              "./results/)")
        return
    timing = rm.get_timing_summary()
    for phase, t in timing["phase_times"].items():
        if t > 0:
            print(f"  {phase:28s}: {t:8.2f}s "
                  f"({timing['percentages'].get(phase, 0):.1f}%)")

    from bobe_tpu.utils.plot import create_summary_plots

    create_summary_plots(rm, gp=results["gp"], save_dir="./results/")


if __name__ == "__main__":
    main()
