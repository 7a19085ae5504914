"""Split the headline bench cycle into its fit / sweep components.

Prints per-phase steady-state timings for the same configuration bench.py
reports as one number, so perf work targets the dominant phase instead of
guessing. Run on the TPU (or CPU with JAX_PLATFORMS handling as in bench.py).

Usage: python tools/bench_split.py [N_TRAIN] [NDIM] [N_MC]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse the exact bench configuration + data)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else bench.N_TRAIN
    d = int(sys.argv[2]) if len(sys.argv) > 2 else bench.NDIM
    n_mc = int(sys.argv[3]) if len(sys.argv) > 3 else bench.N_MC
    bench.N_TRAIN, bench.NDIM, bench.N_MC = n, d, n_mc

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bobe_tpu  # noqa: F401
    from bobe_tpu import config as _config
    from bobe_tpu.acquisition import _wip_sweep_core
    from bobe_tpu.models import gp as gpm

    x, y, mc, x0_extra = bench._make_data()
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    x0 = jnp.asarray(np.vstack(
        [np.log(np.asarray(gp.get_hyperparams()))[None, :], x0_extra]))
    mc_j = jnp.asarray(mc)

    fit = gpm._fit_core(gp.cfg, gp.ndim, bench.MAXITER, "lbfgs",
                        jnp.dtype(_config.compute_dtype()).name)
    sweep = _wip_sweep_core(gp.cfg, True, "float64")

    def time_phase(fn, reps_target_s=2.0):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        dt = time.time() - t0
        reps = max(1, int(reps_target_s / max(dt, 1e-3)))
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    t_fit = time_phase(lambda: fit(gp.state, x0))
    state, _, _ = fit(gp.state, x0)
    jax.block_until_ready(state)
    t_sweep = time_phase(lambda: sweep(state, mc_j))

    print(json.dumps({
        "backend": jax.default_backend(),
        "n_train": n, "ndim": d, "n_mc": n_mc,
        "fit_s": round(t_fit, 4),
        "sweep_s": round(t_sweep, 4),
        "cycle_s": round(t_fit + t_sweep, 4),
        "fit_frac": round(t_fit / (t_fit + t_sweep), 3),
    }))


if __name__ == "__main__":
    main()
