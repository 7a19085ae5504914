"""Acquisition functions: EI / LogEI and the evidence-weighted WIPV / WIPStd.

API mirrors /root/reference/BOBE/acquisition.py (classes EI, LogEI, WIPV,
WIPStd with get_next_point / get_next_batch), but the compute path is
TPU-first:

* EI/LogEI restarts are vmapped lanes of one jitted bounded L-BFGS
  (the reference loops scipy per restart, acquisition.py:281-291).
* The WIP sweep over the MC pool is ONE batched kernel (ops/fantasy.wip_sweep)
  instead of ``lax.map`` over candidates each doing a rank-1 Cholesky update +
  (N+1) x n_mc solve (reference acquisition.py:390-397) — an O(N)-fold
  algorithmic reduction that runs on the MXU.
* Greedy batch selection keeps the reference's hallucination semantics
  (append the GP-mean "fantasy" observation and re-optimize,
  acquisition.py:174-194) on a cheap copy of the functional GP state.

All jitted entry points are cached per (GP config, shape bucket) so the BO
loop never retraces inside a bucket.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import gp as gpm
from .ops import optimize as opt_ops
from .ops.fantasy import (
    fantasy_var_single,
    posterior_batch,
    wip_greedy_batch,
    wip_sweep,
)

# local refinement of pool candidates is skipped above this GP size
# (reference acquisition.py:400); the fused single-dispatch greedy batch
# applies in the same regime
REFINE_MAX_N = 500
from .ops.special import ei_helper, log_ei_helper
from .utils.log import get_logger
from .utils.seed import get_numpy_rng

log = get_logger("acq")

# The WIP sweep stays float64 by default even on TPU: its cost is a single
# tri-solve + matmul (negligible), while the fantasy-variance cancellation
# var - cov^2/var loses all relative accuracy in f32 once the GP starts
# interpolating (posterior variances ~1e-6). Read once at import — this sits
# on the acquisition hot path.
import os as _os

SWEEP_DTYPE = _os.environ.get("BOBE_TPU_SWEEP_DTYPE", "float64")


# ======================================================================
# jitted cores (cached per static signature)
# ======================================================================

@lru_cache(maxsize=32)
def _ei_objective_core(cfg: gpm.GPTrainConfig, use_log: bool, maxiter: int):
    """Jitted vmapped-restart optimizer of (-EI) or (-logEI)."""

    def neg_ei(state, x, best_y, zeta):
        mean, var = gpm.predict_raw(state, cfg, x[None, :])
        mean, var = mean[0], var[0]
        var = jnp.clip(var, 1e-18 if use_log else 1e-20)
        sigma = jnp.sqrt(var)
        u = (mean - zeta - best_y) / sigma
        if use_log:
            return -(log_ei_helper(u) + jnp.log(sigma))
        return -(ei_helper(u) * sigma)

    def run(state, x0, best_y, zeta):
        obj = lambda x: neg_ei(state, x, best_y, zeta)
        return opt_ops.minimize_restarts(
            obj, x0, bounds=(0.0, 1.0), method="lbfgs", maxiter=maxiter
        )

    return jax.jit(run)


@lru_cache(maxsize=32)
def _wip_sweep_core(cfg: gpm.GPTrainConfig, use_std: bool,
                    sweep_dtype: str = "float64"):
    """Jitted full-pool WIP sweep. Returns (acq_vals, V, var).

    sweep_dtype='float32' runs the whole sweep on the MXU in f32 — the argmin
    over candidates is insensitive to that precision."""
    sdt = jnp.dtype(sweep_dtype)

    def run(state, mc_points):
        if sdt != state.x.dtype:
            state = gpm._cast_state(state, sdt)
            mc_points = mc_points.astype(sdt)
        ls, amp = jnp.exp(state.log_ls), jnp.exp(state.log_amp)
        V, var = posterior_batch(cfg.kernel, state.x, state.mask(), state.chol,
                                 mc_points, ls, amp, cfg.noise)
        acq = wip_sweep(cfg.kernel, mc_points, V, var, ls, amp, cfg.noise,
                        state.y_std, use_std)
        return acq, V, var

    return jax.jit(run)


@lru_cache(maxsize=32)
def _wip_batch_core(cfg: gpm.GPTrainConfig, use_std: bool, n_batch: int,
                    sweep_dtype: str = "float64"):
    """Jitted fused greedy batch: posterior solve + n_batch rank-1 downdate
    selections in ONE dispatch (ops/fantasy.wip_greedy_batch)."""
    sdt = jnp.dtype(sweep_dtype)

    def run(state, mc_points):
        if sdt != state.x.dtype:
            state = gpm._cast_state(state, sdt)
            mc_points = mc_points.astype(sdt)
        ls, amp = jnp.exp(state.log_ls), jnp.exp(state.log_amp)
        V, var = posterior_batch(cfg.kernel, state.x, state.mask(), state.chol,
                                 mc_points, ls, amp, cfg.noise)
        idx, vals = wip_greedy_batch(cfg.kernel, mc_points, V, var, ls, amp,
                                     cfg.noise, state.y_std, use_std, n_batch)
        return mc_points[idx], vals

    return jax.jit(run)


@lru_cache(maxsize=32)
def _wip_refine_core(cfg: gpm.GPTrainConfig, use_std: bool, maxiter: int):
    """Jitted local polish of the best pool candidate (reference
    acquisition.py:400-412), differentiating through the fantasy variance."""

    def objective(state, x, mc_points, V, var):
        ls, amp = jnp.exp(state.log_ls), jnp.exp(state.log_amp)
        fv = fantasy_var_single(cfg.kernel, state.x, state.mask(), state.chol,
                                x, mc_points, V, var, ls, amp, cfg.noise)
        if use_std:
            return jnp.mean(jnp.sqrt(fv)) * state.y_std
        return jnp.mean(fv) * state.y_std**2

    def run(state, x0, mc_points, V, var):
        obj = lambda x: objective(state, x, mc_points, V, var)
        return opt_ops.minimize_restarts(
            obj, x0, bounds=(0.0, 1.0), method="lbfgs", maxiter=maxiter
        )

    return jax.jit(run)


# ======================================================================
# Acquisition classes (reference-compatible API)
# ======================================================================

class AcquisitionFunction:
    """Base class; subclasses implement fun() and get_next_point()."""

    name: str = "BaseAcquisitionFunction"

    def __init__(self, optimizer: str = "lbfgs",
                 optimizer_options: Optional[Dict[str, Any]] = None):
        self.optimizer = optimizer
        self.optimizer_options = dict(optimizer_options or {})

    def fun(self, x, gp, **kwargs):
        raise NotImplementedError

    def get_next_point(self, gp, acq_kwargs=None, maxiter=500, n_restarts=8,
                       verbose=True, early_stop_patience=25, rng=None):
        raise NotImplementedError

    def get_next_batch(self, gp, n_batch: int = 1, acq_kwargs=None,
                       maxiter: int = 500, n_restarts: int = 8,
                       verbose: bool = True, early_stop_patience: int = 25,
                       rng=None) -> Tuple[np.ndarray, np.ndarray]:
        """Greedy batch via GP-mean hallucination (reference
        acquisition.py:147-196)."""
        rng = rng if rng is not None else get_numpy_rng()
        acq_kwargs = dict(acq_kwargs or {})

        x_next, v_next = self.get_next_point(
            gp, acq_kwargs=acq_kwargs, maxiter=maxiter, n_restarts=n_restarts,
            verbose=verbose, early_stop_patience=early_stop_patience, rng=rng)
        x_batch, acq_vals = [np.asarray(x_next)], [float(v_next)]

        if n_batch > 1:
            # plain-GP clone sharing the padded state (classifier gating is
            # intentionally dropped, as in the reference :174-180)
            dummy = gpm.GP.dummy_like(gp)
            mu = dummy.predict_mean_single(jnp.asarray(x_next))
            dummy.update(jnp.asarray(x_next)[None, :], jnp.asarray(mu)[None])
            for _ in range(1, n_batch):
                x_next, v_next = self.get_next_point(
                    dummy, acq_kwargs=acq_kwargs, maxiter=maxiter,
                    n_restarts=n_restarts, verbose=verbose,
                    early_stop_patience=early_stop_patience, rng=rng)
                x_batch.append(np.asarray(x_next))
                acq_vals.append(float(v_next))
                mu = dummy.predict_mean_single(jnp.asarray(x_next))
                dummy.update(jnp.asarray(x_next)[None, :], jnp.asarray(mu)[None])

        return np.array(x_batch), np.array(acq_vals)


class EI(AcquisitionFunction):
    """Expected Improvement: EI(x) = E[max(f(x) - best - zeta, 0)]."""

    name = "EI"
    _use_log = False

    def fun(self, x, gp, best_y, zeta):
        mean, var = gp.predict_single(x)
        var = jnp.clip(var, 1e-20)
        sigma = jnp.sqrt(var)
        u = (mean - zeta - best_y) / sigma
        return jnp.reshape(-(ei_helper(u) * sigma), ())

    def get_next_point(self, gp, acq_kwargs=None, maxiter=250, n_restarts=20,
                       verbose=True, early_stop_patience=25, rng=None):
        rng = rng if rng is not None else get_numpy_rng()
        acq_kwargs = dict(acq_kwargs or {})
        zeta = float(acq_kwargs.get("zeta", 0.0))
        best_y = acq_kwargs.get("best_y")
        if best_y is None:
            best_y = float(jnp.max(gp.train_y)) if gp.npoints > 0 else 0.0
        best_x = np.asarray(gp.train_x[int(jnp.argmax(gp.train_y))])

        # restart seeding: half classifier-aware random, half incumbent
        # (reference acquisition.py:271-280)
        if n_restarts > 1:
            n_rand = n_restarts // 2
            x0 = np.vstack([gp.get_random_point(rng, nstd=5) for _ in range(n_rand)])
            x0 = np.vstack([x0, np.tile(best_x, (n_restarts - n_rand, 1))])
        else:
            x0 = best_x[None, :]
        x0 = np.clip(x0 + rng.normal(0.0, 0.005, size=x0.shape), 0.0, 1.0)

        run = _ei_objective_core(gp.cfg, self._use_log, int(maxiter))
        x, f = run(gp.state, jnp.asarray(x0), jnp.asarray(float(best_y)),
                   jnp.asarray(zeta))
        return np.asarray(x), -float(f)


class LogEI(EI):
    """Log Expected Improvement (Ament et al. 2023, arXiv:2310.20708)."""

    name = "LogEI"
    _use_log = True

    def fun(self, x, gp, best_y, zeta):
        mean, var = gp.predict_single(x)
        var = jnp.clip(var, 1e-18)
        sigma = jnp.sqrt(var)
        u = (mean - zeta - best_y) / sigma
        return jnp.reshape(-(log_ei_helper(u) + jnp.log(sigma)), ())


class WeightedIntegratedPosteriorBase(AcquisitionFunction):
    """Shared machinery for WIPV / WIPStd."""

    _use_std = False

    def get_next_batch(self, gp, n_batch: int = 1, acq_kwargs=None,
                       maxiter: int = 500, n_restarts: int = 8,
                       verbose: bool = True, early_stop_patience: int = 25,
                       rng=None):
        """Greedy batch. Above REFINE_MAX_N points (where the per-member
        local polish is skipped anyway, reference acquisition.py:400) the
        whole batch is selected in ONE fused device dispatch via the rank-1
        downdate identity; below, the reference's hallucination loop runs."""
        if n_batch <= 1 or gp.npoints <= REFINE_MAX_N:
            return super().get_next_batch(
                gp, n_batch=n_batch, acq_kwargs=acq_kwargs, maxiter=maxiter,
                n_restarts=n_restarts, verbose=verbose,
                early_stop_patience=early_stop_patience, rng=rng)

        rng = rng if rng is not None else get_numpy_rng()
        acq_kwargs = dict(acq_kwargs or {})
        mc_samples = acq_kwargs.get("mc_samples")
        mc_points_size = int(acq_kwargs.get("mc_points_size", 128))
        mc_points = jnp.asarray(get_mc_points(
            mc_samples, mc_points_size=mc_points_size, rng=rng))
        core = _wip_batch_core(gp.cfg, self._use_std, int(n_batch), SWEEP_DTYPE)
        pts, vals = core(gp.state, mc_points)
        return np.asarray(pts), np.asarray(vals)

    def fun(self, x, gp, mc_points=None, k_train_mc=None):
        fv = gp.fantasy_var(x, mc_points, k_train_mc)
        if self._use_std:
            return jnp.mean(jnp.sqrt(fv))
        return jnp.mean(fv)

    def get_next_point(self, gp, acq_kwargs=None, maxiter=100, n_restarts=1,
                       verbose=True, early_stop_patience=25, rng=None):
        rng = rng if rng is not None else get_numpy_rng()
        acq_kwargs = dict(acq_kwargs or {})
        mc_samples = acq_kwargs.get("mc_samples")
        mc_points_size = int(acq_kwargs.get("mc_points_size", 128))
        mc_points = get_mc_points(mc_samples, mc_points_size=mc_points_size, rng=rng)
        mc_points = jnp.asarray(mc_points)

        sweep = _wip_sweep_core(gp.cfg, self._use_std, SWEEP_DTYPE)
        acq_vals, V, var = sweep(gp.state, mc_points)
        i_best = int(jnp.argmin(acq_vals))
        acq_min = float(acq_vals[i_best])
        x0 = mc_points[i_best]
        log.debug(f"{self.name} min over MC pool: {acq_min:.4e}")

        if gp.npoints > REFINE_MAX_N:  # skip polish at large N (reference :400)
            return np.asarray(x0), acq_min

        refine = _wip_refine_core(gp.cfg, self._use_std, int(maxiter))
        x, f = refine(gp.state, x0[None, :], mc_points, V, var)
        if float(f) <= acq_min:
            return np.asarray(x), float(f)
        return np.asarray(x0), acq_min


class WIPV(WeightedIntegratedPosteriorBase):
    """Evidence-weighted integrated posterior *variance*."""

    name = "WIPV"
    _use_std = False


class WIPStd(WeightedIntegratedPosteriorBase):
    """Evidence-weighted integrated posterior *standard deviation*."""

    name = "WIPStd"
    _use_std = True


# ======================================================================
# MC sample sources
# ======================================================================

def get_mc_samples(gp, warmup_steps=512, num_samples=1024, thinning=4,
                   method="NUTS", num_chains=4, np_rng=None, rng_key=None,
                   warm_state=None):
    """Posterior MC samples of the GP surrogate (reference acquisition.py:468).

    'NUTS' -> on-device NUTS chains; 'NS' -> on-device vectorized nested
    sampling (cheap settings); 'uniform' -> scrambled Sobol in the unit cube.
    ``warm_state``: previous NUTS call's adapted kernel (see
    samplers.sample_gp_nuts) for cheap cross-iteration re-warming.
    """
    if method == "NUTS":
        from .samplers import sample_gp_nuts

        return sample_gp_nuts(gp, warmup_steps=warmup_steps,
                              num_samples=num_samples, thinning=thinning,
                              num_chains=num_chains, np_rng=np_rng,
                              rng_key=rng_key, warm_state=warm_state)
    elif method == "NS":
        from .samplers import nested_sampling

        samples, _, _ = nested_sampling(gp, mode="acq", dlogz=0.02,
                                        equal_weights=True, rng=np_rng)
        return samples
    elif method == "uniform":
        from scipy.stats import qmc

        rng = np_rng if np_rng is not None else get_numpy_rng()
        pts = qmc.Sobol(gp.ndim, scramble=True, rng=rng).random(num_samples)
        return {"x": pts}
    raise ValueError(f"Unknown MC sample method '{method}'")


def get_mc_points(mc_samples, mc_points_size=128, rng=None):
    """Subsample the MC pool without replacement (reference :485-489)."""
    rng = rng if rng is not None else get_numpy_rng()
    x = np.asarray(mc_samples["x"])
    n = x.shape[0]
    if n <= mc_points_size:
        return x
    idx = rng.choice(n, size=mc_points_size, replace=False)
    return x[idx]
