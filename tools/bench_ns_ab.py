"""A/B timing for the NS slice loop on a standalone GP-like target.

Times run_nested wall-clock (steady-state: compile excluded by a warmup run)
on a correlated d-dim Gaussian at convergence-mode settings, on whatever
backend jax picks (TPU when the relay is up). Run once on the pre-change
tree and once post-change; accuracy is reported as |logZ - analytic|.

Usage: python tools/bench_ns_ab.py [d] [nlive] [seeds...]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bobe_tpu.infer import integrals
from bobe_tpu.infer.nested import run_nested


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nlive = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    seeds = [int(s) for s in sys.argv[3:]] or [0, 1, 2]

    # correlated Gaussian in the unit cube, analytic logZ ~ integral of the
    # unnormalized Gaussian over [0,1]^d (sigma small enough that the tails
    # are fully inside: logZ = d/2 log(2 pi) + sum(log sigma))
    rng = np.random.default_rng(42)
    sig = 0.02 + 0.03 * rng.random(d)
    mu = 0.35 + 0.3 * rng.random(d)
    logz_true = float(0.5 * d * np.log(2 * np.pi) + np.log(sig).sum())
    mu_j, sig_j = jnp.asarray(mu), jnp.asarray(sig)

    def apply_fn(ctx, x):
        return -0.5 * jnp.sum(((x - mu_j) / sig_j) ** 2, axis=-1)

    n_repeats = int(np.ceil((3.0 if d >= 10 else 1.5) * d))
    print(f"backend={jax.default_backend()} d={d} nlive={nlive} "
          f"n_repeats={n_repeats} logz_true={logz_true:.4f}")

    # warmup compile
    run_nested(apply_fn, None, d, jax.random.PRNGKey(99), nlive=nlive,
               dlogz=0.01, n_repeats=n_repeats,
               rng=np.random.default_rng(99))

    walls, errs, calls = [], [], []
    for s in seeds:
        t0 = time.time()
        res = run_nested(apply_fn, None, d, jax.random.PRNGKey(s),
                         nlive=nlive, dlogz=0.01, n_repeats=n_repeats,
                         rng=np.random.default_rng(s))
        w = time.time() - t0
        logz = float(integrals.trapezoid_logz(res.dead_logl, res.logvol,
                                              lv_start=res.logvol0)[-1])
        walls.append(w)
        errs.append(abs(logz - logz_true))
        calls.append(res.n_calls)
        print(f"  seed={s} wall={w:.2f}s calls={res.n_calls} "
              f"n_iter={res.n_iter} |dlogZ|={errs[-1]:.4f}")
    print(f"median wall {np.median(walls):.2f}s  mean |dlogZ| "
          f"{np.mean(errs):.4f}  mean calls {np.mean(calls):.0f}")


if __name__ == "__main__":
    main()
