"""d=30 GP-bound A/B: does input warping tighten the honest evidence bound?

VERDICT r4 item 3 asks for a sub-0.1 REPORTED bound at d=30 and names input
warping as the lever to validate (gp.py input_warp — beyond-reference; the
reference is strictly stationary, /root/reference/BOBE/gp.py:124-168).
A full warp BO run at d=30 costs hours on a 1-core host (warp disables the
per-dimension distance precompute, so each host-f64 MLL eval re-derives the
pairwise distances — measured ~3 min/refit in the N in [384,512] band), so
this harness answers the lever question with a CONTROLLED comparison at the
terminal scale instead:

  * ONE fixed N-point design at d=30 (tempered draws around the analytic
    Gaussian posterior + uniform exploration — the shape a finished WIPStd
    run leaves behind: bulk coverage plus tails), identical for both arms;
  * fit a stationary GP and a warp GP on it (same restarts/iters/rng);
  * run the PRODUCTION convergence NS + bound pipeline (samplers.
    nested_sampling, mode='convergence', merged n_runs) on each;
  * report |logZ - truth|, the GP half-width (the convergence delta), LOO
    kappa, err_total per arm.

Usage: python tools/warp30_ab.py [n=1200] [seed=4] [n_runs=2] [warm=path.npz]
  warm: optional GP checkpoint whose hyperparameters seed the warp arm's
  first restart (e.g. a partial BO run's gaussian30d_gp.npz).
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

from bobe_tpu.models import gp as gpm  # noqa: E402
from bobe_tpu.models import toys  # noqa: E402
from bobe_tpu.samplers import nested_sampling  # noqa: E402

D = 30
SIGMA = 0.12


def make_design(n: int, rng: np.random.Generator) -> np.ndarray:
    """Posterior-bulk-weighted design in the unit cube: tempered Gaussian
    shells (T=1,2,4 -> sd = SIGMA*sqrt(T)) plus uniform exploration, the
    density profile a converged WIPStd run leaves behind at d=30."""
    fracs = [(0.45, 1.0), (0.30, 2.0), (0.15, 4.0)]
    parts = []
    for frac, temp in fracs:
        m = int(round(frac * n))
        parts.append(rng.normal(0.5, SIGMA * np.sqrt(temp), size=(m, D)))
    parts.append(rng.uniform(size=(n - sum(p.shape[0] for p in parts), D)))
    x = np.clip(np.vstack(parts), 1e-6, 1 - 1e-6)
    rng.shuffle(x)
    return x


def run_arm(x, y, logz_true, *, warp: bool, seed: int, n_runs: int,
            warm_params=None, maxiter=300, n_restarts=3) -> dict:
    t0 = time.time()
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y),
                input_warp=warp)
    if warm_params is not None and warp:
        gp.state = gpm.set_hyperparams(gp.state, gp.cfg,
                                       jnp.asarray(warm_params))
    gp.fit(maxiter=maxiter, n_restarts=n_restarts,
           rng=np.random.default_rng(seed))
    kappa = float(gp.loo_z_rms()) if hasattr(gp, "loo_z_rms") else float("nan")
    t_fit = time.time() - t0

    t1 = time.time()
    _, logz, ok = nested_sampling(
        gp, mode="convergence", rng=np.random.default_rng(seed + 1),
        rng_key=jax.random.PRNGKey(seed + 1), n_runs=n_runs)
    t_ns = time.time() - t1
    out = {
        "arm": "warp" if warp else "stationary",
        "ok": bool(ok),
        "logz": float(logz["mean"]),
        "err_vs_truth": float(abs(logz["mean"] - logz_true)),
        "gp_half_width": float(0.5 * (logz["upper"] - logz["lower"])),
        "err_total": float(logz.get("err_total", float("nan"))),
        "dlogz_sampler": float(logz.get("dlogz_sampler", float("nan"))),
        "dlogz_hyp": float(logz.get("dlogz_hyp", float("nan"))),
        "loo_kappa": kappa,
        "wall_fit_s": round(t_fit, 1),
        "wall_ns_s": round(t_ns, 1),
    }
    if warp:
        out["warp_move"] = float(jnp.max(jnp.abs(gp.state.log_wa))
                                 + jnp.max(jnp.abs(gp.state.log_wb)))
    return out


def main(n=1200, seed=4, n_runs=2, warm=None):
    loglike, _, logz_true = toys.make_gaussian(D, sigma=SIGMA)
    rng = np.random.default_rng(seed)
    x = make_design(n, rng)
    y = np.array([float(loglike(xi)) for xi in x])
    print(f"design: n={n} d={D} y in [{y.min():.1f}, {y.max():.1f}] "
          f"logz_true={logz_true:.4f}", flush=True)

    warm_params = None
    if warm and os.path.exists(warm):
        g = gpm.GP.load(warm)
        if g.cfg.input_warp:
            warm_params = np.asarray(g.get_hyperparams())
            print(f"warm-starting warp arm from {warm} "
                  f"({len(warm_params)} hyperparams)", flush=True)

    for warp in (False, True):
        res = run_arm(x, y, logz_true, warp=warp, seed=seed, n_runs=n_runs,
                      warm_params=warm_params)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        kw[k] = v if k == "warm" else int(v)
    main(**kw)
