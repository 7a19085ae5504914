"""d=30 NS schedule campaign: find the (nlive, n_runs) merge schedule whose
5-seed maxabs |dlogZ| on the TRUE 30-d Gaussian is <= 0.10.

Round 3 measured maxabs 0.148 at nlive=4800 single-run (sampler noise
sqrt(H/nlive) ~ 0.066, so 5-seed maxabs ~ 2.2 sigma overshoots the target);
merging b independent base runs divides the noise by sqrt(b) at the same
compiled graph shape (infer/nested.merge_runs — dynesty's varying-live-count
combine). This prints per-schedule per-seed errors + the maxabs so the
winning schedule can be pinned in a slow test and quoted in BENCH_NOTES.

Usage: python tools/ns30_campaign.py "4800x2" "4800x3" [--seeds 0,1,2,3,4]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bobe_tpu.infer.integrals import trapezoid_logz  # noqa: E402
from bobe_tpu.infer.nested import merge_runs, run_nested  # noqa: E402
from bobe_tpu.models import toys  # noqa: E402

D = 30
SIGMA = 0.12


def gauss_apply(ctx, x):
    return (-0.5 * jnp.sum(((x - 0.5) / SIGMA) ** 2, axis=-1)
            - 0.5 * D * jnp.log(2 * jnp.pi * SIGMA**2))


def one_schedule(nlive: int, n_runs: int, seeds) -> dict:
    _, _, logz_true = toys.make_gaussian(D, sigma=SIGMA)
    errs, walls = [], []
    for seed in seeds:
        t0 = time.time()
        key = jax.random.PRNGKey(seed)
        raws = []
        for i, k in enumerate(jax.random.split(key, n_runs)):
            res = run_nested(gauss_apply, None, D, k, nlive=nlive,
                             dlogz=0.01, maxcall=int(100 * nlive * 90),
                             n_repeats=3 * D,
                             rng=np.random.default_rng(seed * 100 + i))
            assert res.success
            raws.append((res.dead_x, res.dead_logl,
                         np.asarray(res.nlive_schedule, float), -np.inf))
        if n_runs > 1:
            _, logls, logvol, _ = merge_runs(raws)
        else:
            logls, logvol = raws[0][1], res.logvol
        logz = float(trapezoid_logz(logls, logvol)[-1])
        errs.append(logz - logz_true)
        walls.append(time.time() - t0)
        print(json.dumps({"nlive": nlive, "n_runs": n_runs, "seed": seed,
                          "err": round(errs[-1], 4),
                          "wall_s": round(walls[-1], 1)}), flush=True)
    return {"nlive": nlive, "n_runs": n_runs,
            "errs": [round(e, 4) for e in errs],
            "mean": round(float(np.mean(errs)), 4),
            "maxabs": round(max(abs(e) for e in errs), 4),
            "wall_per_seed_s": round(float(np.mean(walls)), 1)}


def main():
    schedules = [a for a in sys.argv[1:] if not a.startswith("--")]
    schedules = schedules or ["4800x1", "4800x3"]
    seeds = list(range(5))
    for a in sys.argv[1:]:
        if a.startswith("--seeds"):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
    out = []
    for sch in schedules:
        nlive, n_runs = (int(v) for v in sch.split("x"))
        out.append(one_schedule(nlive, n_runs, seeds))
        print(json.dumps(out[-1]), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
