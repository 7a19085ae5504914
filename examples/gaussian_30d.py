"""High-dimensional Gaussian toy (30d) — the reference's dimensionality
envelope test (docs index.rst:28-29). Analytic logZ is known exactly."""
import os

import numpy as np

from bobe_tpu import BOBE
from bobe_tpu.models import toys


def main(max_gp_size=1200, max_evals=1500, seed=4, resume=0):
    d = 30
    loglike, bounds, logz_true = toys.make_gaussian(d, sigma=0.12)
    bobe = BOBE(
        loglikelihood=loglike,
        param_list=[f"x{i}" for i in range(d)],
        param_bounds=bounds,
        likelihood_name="gaussian30d",
        n_sobol_init=128,
        seed=seed,
        save_dir="./results/",
        # resume=1 continues from ./results/gaussian30d_* checkpoints (long
        # d=30 runs are checkpointed every save_step iterations, so a killed
        # run loses at most a few batches)
        resume=bool(resume),
        resume_file="./results/gaussian30d" if resume else None,
        # BOBE_TPU_EX_WARP=1: input warping. Measured OUT as the d=30
        # bound lever (round 5, tools/warp30_ab.py): this target is
        # isotropic, so the 60 extra warp hyperparameters are pure fit
        # fragility (A/B: bound 48x wider, mean off 3.5 nats) and the warp
        # fit forgoes the distance precompute (~5x slower refits in the
        # host-f64 band). The validated bound lever is cap escalation:
        # max_gp_size=2048 measured half-width 0.29 -> 0.113 (BENCH_NOTES
        # round 3). Warping stays available here for A/B reproduction.
        gp_kwargs=({"input_warp": True}
                   if os.environ.get("BOBE_TPU_EX_WARP") == "1" else None),
    )
    results = bobe.run(
        acq="wipstd", min_evals=300, max_evals=max_evals,
        max_gp_size=max_gp_size,
        logz_threshold=1e-1, fit_n_points=16, batch_size=8, ns_n_points=24,
        convergence_n_iters=2, mc_points_size=128,
        # in d=30 the acquisition can stay above the NS gate until the GP
        # budget is exhausted — always finish with a (dynamic) NS so the run
        # reports an evidence estimate either way
        do_final_ns=True,
    )
    if results is None:
        return
    logz = results.get("logz", {})
    print(f"logZ = {logz.get('mean', float('nan')):.3f} "
          f"(analytic {logz_true:.3f})  "
          f"bounds = ({logz.get('lower', float('nan')):.3f}, "
          f"{logz.get('upper', float('nan')):.3f})  "
          f"err_total = {logz.get('err_total', float('nan')):.4f}  "
          f"[sampler {logz.get('dlogz_sampler', float('nan')):.4f}, "
          f"hyp {logz.get('dlogz_hyp', float('nan')):.4f}]")
    return results


if __name__ == "__main__":
    import sys

    allowed = ("max_gp_size", "max_evals", "seed", "resume")
    kw = {}
    for a in sys.argv[1:]:
        k, sep, v = a.partition("=")
        if not sep or k not in allowed or not v.lstrip("-").isdigit():
            sys.exit(f"usage: {sys.argv[0]} "
                     + " ".join(f"[{k}=N]" for k in allowed))
        kw[k] = int(v)
    main(**kw)
