"""Multi-seed |dlogZ| evidence runs for the 2-D toys, in one process.

Runs the banana and himmelblau examples' exact configurations across several
seeds and prints a JSON summary (per-seed logZ, |dlogZ| vs brute-force truth,
wall per run). One process so the compiled graphs amortize across seeds —
the per-seed walls after the first are the steady-state numbers quoted in
BENCH_NOTES.

Usage::

    python tools/multiseed_eval.py [banana|himmelblau|both] [--seeds 42,7,11]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# match the examples' fit policy (cheap analytic toys -> f32+polish path).
# Remember whether WE set it: run_planck must lift only this tool's default,
# never a value the user exported explicitly (advisor round 4).
_F64_CAP_WAS_USER_SET = "BOBE_TPU_F64_FIT_MAX_CAP" in os.environ
os.environ.setdefault("BOBE_TPU_F64_FIT_MAX_CAP", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRUTH = {"banana": -3.185, "himmelblau": -5.504}


def run_banana(seed: int) -> dict:
    from bobe_tpu import BOBE
    from bobe_tpu.models import toys

    bobe = BOBE(loglikelihood=toys.banana, param_list=toys.banana_names,
                param_bounds=toys.banana_bounds, likelihood_name="banana",
                n_sobol_init=8, seed=seed, save=False)
    return bobe.run(acq="wipstd", min_evals=25, max_evals=250,
                    max_gp_size=250, logz_threshold=5e-2, do_final_ns=True,
                    fit_n_points=1, batch_size=1, ns_n_points=1,
                    num_hmc_samples=2048, mc_points_size=512,
                    convergence_n_iters=2)


def run_himmelblau(seed: int) -> dict:
    from bobe_tpu import BOBE
    from bobe_tpu.models import toys

    bobe = BOBE(loglikelihood=toys.himmelblau,
                param_list=toys.himmelblau_names,
                param_bounds=toys.himmelblau_bounds,
                likelihood_name="himmelblau", n_sobol_init=32, seed=seed,
                save=False)
    return bobe.run(acq="wipstd", min_evals=60, max_evals=400,
                    max_gp_size=400, logz_threshold=2e-2, fit_n_points=4,
                    batch_size=4, ns_n_points=8, convergence_n_iters=2,
                    mc_points_size=256)


def run_planck(seed: int) -> dict:
    """The planck-like synthetic configuration (examples/
    planck_like_synthetic.py) with analytic truth; returns the results dict
    extended with the truth so the caller can score coverage."""
    # the module-top F64_FIT_MAX_CAP=0 is the 2-d TOY fit policy; the
    # planck-like runs must use the production f64-fit default — the f32
    # objective's jitter floor over-smooths hyperparameter selection on this
    # curved low-noise regime (measured round 3: |dlogZ| 0.184 @ 484
    # budget-capped evals vs 0.001 @ 216 converged; re-measured round 4 when
    # this tool's env leaked into the coverage campaign: seeds capped at 500
    # evals with widened deltas)
    lifted = (not _F64_CAP_WAS_USER_SET
              and os.environ.get("BOBE_TPU_F64_FIT_MAX_CAP") == "0")
    if lifted:
        del os.environ["BOBE_TPU_F64_FIT_MAX_CAP"]
    try:
        from bobe_tpu import BOBE
        from bobe_tpu.models.toys import make_planck_like, planck_like_ref_draws

        loglike, bounds, names, logz_true = make_planck_like()
        rng = np.random.default_rng(seed)
        ref_x, ref_y = planck_like_ref_draws(loglike, bounds, 8, rng)
        bobe = BOBE(loglikelihood=loglike, param_list=names,
                    param_bounds=bounds, n_sobol_init=48, n_cobaya_init=0,
                    init_train_x=ref_x, init_train_y=ref_y, use_clf=True,
                    clf_type="svm", seed=seed, save=False,
                    verbosity="WARNING")
        res = bobe.run(acq="wipstd", min_evals=120, max_evals=500,
                       max_gp_size=600, logz_threshold=0.05, fit_n_points=8,
                       batch_size=4, ns_n_points=12, convergence_n_iters=2,
                       do_final_ns=True)
        res["logz_true"] = logz_true
        return res
    finally:
        # restore the toy default so toy problems after 'planck' in the same
        # invocation keep the f32+polish policy they document
        if lifted:
            os.environ["BOBE_TPU_F64_FIT_MAX_CAP"] = "0"


def main():
    problems = [a for a in sys.argv[1:] if not a.startswith("--")]
    problems = problems or ["both"]
    seeds = None
    for a in sys.argv[1:]:
        if a.startswith("--seeds"):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
    runner = {"banana": run_banana, "himmelblau": run_himmelblau,
              "planck": run_planck}
    todo = ["banana", "himmelblau"] if problems[0] == "both" else problems
    out = {}
    for prob in todo:
        rows = []
        for seed in (seeds or [42, 7, 11, 23, 101]):
            t0 = time.time()
            try:
                res = runner[prob](seed)
                logz = float(res["logz"]["mean"])
                n = int(res["gp"].npoints)
            except Exception as e:  # record, keep going
                rows.append({"seed": seed, "error": repr(e)})
                continue
            truth = float(res.get("logz_true", TRUTH.get(prob, np.nan)))
            row = {"seed": seed, "logz": round(logz, 4),
                   "abs_dlogz": round(abs(logz - truth), 4),
                   "evals": n, "wall_s": round(time.time() - t0, 1)}
            lz = res["logz"]
            if "upper" in lz and "lower" in lz:
                # the delta the convergence rule uses: half the GP-sigma
                # bound width — coverage of |dlogZ| <= delta validates the
                # LOO sigma calibration of the GP bound alone; the total
                # reported uncertainty adds the NS sampler noise
                # (dlogz_sampler) in quadrature, which is what a user should
                # read as the evidence error bar
                delta = 0.5 * (float(lz["upper"]) - float(lz["lower"]))
                dls = float(lz.get("dlogz_sampler", np.nan))
                row["delta_reported"] = round(delta, 4)
                row["dlogz_sampler"] = round(dls, 4)
                row["dlogz_hyp"] = round(float(lz.get("dlogz_hyp", 0.0)), 4)
                row["covered"] = bool(row["abs_dlogz"] <= delta)
                # the USER-FACING error bar: prefer the run's own err_total
                # (GP (+) sampler (+) hyperparameter-basin spread) over the
                # local two-term reconstruction
                total = float(lz.get("err_total", np.nan))
                if not np.isfinite(total):
                    total = float(np.sqrt(delta**2
                                          + (dls if np.isfinite(dls)
                                             else 0.0)**2))
                row["err_total"] = round(total, 4)
                row["covered_total"] = bool(row["abs_dlogz"] <= total)
            rows.append(row)
            print(json.dumps({prob: rows[-1]}), flush=True)
        out[prob] = rows
        for key in ("covered", "covered_total"):
            vals = [r.get(key) for r in rows if key in r]
            if vals:
                out[f"{prob}_{key}_coverage"] = round(
                    float(np.mean([1.0 if c else 0.0 for c in vals])), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
