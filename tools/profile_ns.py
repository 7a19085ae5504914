"""Profile the on-device nested sampler at cosmology-regime shapes.

Measures wall-time and call counts of a convergence-mode NS run for
(a) an analytic Gaussian likelihood (isolates sampler-structure overhead:
    sequential while_loop depth x per-step dispatch cost), and
(b) a GP-mean likelihood at cap-640, d=6 (the planck-like surrogate shape,
    where NS was measured at 650 s of a 1433 s run — BENCH_NOTES r3s9).

Usage: python tools/profile_ns.py [d] [nlive] [cap]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    nlive = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 640

    import jax
    import jax.numpy as jnp

    from bobe_tpu.infer import integrals
    from bobe_tpu.infer.nested import run_nested

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    sigma = 0.12

    def gauss_apply(ctx, x):
        return -0.5 * jnp.sum(((x - 0.5) / sigma) ** 2, axis=-1)

    from scipy.stats import norm
    mass = (norm.cdf(0.5 / sigma) - norm.cdf(-0.5 / sigma)) ** d
    want = float(np.log(mass)) - 0.5 * d * np.log(2 * np.pi * sigma**2)

    def one(apply, ctx, tag, key=0):
        t0 = time.time()
        res = run_nested(apply, ctx, d, jax.random.PRNGKey(key), nlive=nlive,
                         dlogz=0.01, rng=np.random.default_rng(key + 1))
        wall = time.time() - t0
        lz = integrals.trapezoid_logz(res.dead_logl, res.logvol)[-1]
        print(f"{tag}: wall={wall:.2f}s n_iter={res.n_iter} "
              f"n_calls={res.n_calls} n_dead={len(res.dead_logl) - res.nlive} "
              f"logz={lz:.4f} (analytic {want:.4f}, err {lz - want:+.4f})",
              flush=True)
        return wall

    # warm (compile) + 2 measured runs, analytic target
    one(gauss_apply, jnp.zeros(()), "gauss warm")
    one(gauss_apply, jnp.zeros(()), "gauss run1", key=1)
    one(gauss_apply, jnp.zeros(()), "gauss run2", key=2)

    # GP-backed target at production shapes
    from bobe_tpu.models.gp import GP
    from bobe_tpu.samplers import _gp_loglike

    rng = np.random.default_rng(0)
    X = rng.uniform(size=(cap, d))
    y = np.asarray(gauss_apply(None, jnp.asarray(X)))
    gp = GP(X, y, lengthscales=0.3 * np.ones(d), kernel_variance=25.0,
            kernel="matern")
    apply_fn, ctx = _gp_loglike(gp)
    one(apply_fn, ctx, "gp    warm")
    one(apply_fn, ctx, "gp    run1", key=1)
    one(apply_fn, ctx, "gp    run2", key=2)


if __name__ == "__main__":
    main()
