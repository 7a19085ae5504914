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

# match the examples' fit policy (cheap analytic toys -> f32+polish path)
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


def main():
    problems = [a for a in sys.argv[1:] if not a.startswith("--")]
    problems = problems or ["both"]
    seeds = None
    for a in sys.argv[1:]:
        if a.startswith("--seeds"):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
    runner = {"banana": run_banana, "himmelblau": run_himmelblau}
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
            rows.append({"seed": seed, "logz": round(logz, 4),
                         "abs_dlogz": round(abs(logz - TRUTH[prob]), 4),
                         "evals": n, "wall_s": round(time.time() - t0, 1)})
            print(json.dumps({prob: rows[-1]}), flush=True)
        out[prob] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
