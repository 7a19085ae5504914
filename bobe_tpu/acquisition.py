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
# interpolating (posterior variances ~1e-6). Read ONCE at import (this sits
# on the acquisition hot path): set the env var before `import bobe_tpu`, or
# assign the module attribute to change it afterwards.
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
                    sweep_dtype: str = "float64", mesh=None):
    """Jitted full-pool WIP sweep. Returns (acq_vals, V, var).

    sweep_dtype='float32' runs the whole sweep on the MXU in f32 — the argmin
    over candidates is insensitive to that precision. With a ``mesh`` the
    candidate axis is sharded over the devices (GP state replicated; GSPMD
    inserts the gathers)."""
    sdt = jnp.dtype(sweep_dtype)

    def run(state, mc_points):
        if sdt != state.x.dtype:
            state = gpm._cast_state(state, sdt)
            mc_points = mc_points.astype(sdt)
        if mesh is not None:
            from .parallel.mesh import batch_sharded

            mc_points = jax.lax.with_sharding_constraint(
                mc_points, batch_sharded(mesh))
        ls, amp = jnp.exp(state.log_ls), jnp.exp(state.log_amp)
        # kernel math in warp space (identity unless cfg.input_warp)
        mc_w = gpm.query_coords(state, cfg, mc_points)
        V, var = posterior_batch(cfg.kernel, gpm.train_coords(state, cfg),
                                 state.mask(), state.chol,
                                 mc_w, ls, amp, cfg.noise)
        acq = wip_sweep(cfg.kernel, mc_w, V, var, ls, amp, cfg.noise,
                        state.y_std, use_std)
        return acq, V, var

    return jax.jit(run)


@lru_cache(maxsize=32)
def _wip_batch_core(cfg: gpm.GPTrainConfig, use_std: bool, n_batch: int,
                    sweep_dtype: str = "float64", mesh=None):
    """Jitted fused greedy batch: posterior solve + n_batch rank-1 downdate
    selections in ONE dispatch (ops/fantasy.wip_greedy_batch)."""
    sdt = jnp.dtype(sweep_dtype)

    def run(state, mc_points):
        if sdt != state.x.dtype:
            state = gpm._cast_state(state, sdt)
            mc_points = mc_points.astype(sdt)
        if mesh is not None:
            from .parallel.mesh import batch_sharded

            mc_points = jax.lax.with_sharding_constraint(
                mc_points, batch_sharded(mesh))
        ls, amp = jnp.exp(state.log_ls), jnp.exp(state.log_amp)
        # kernel math in warp space; the RETURNED points must stay raw (they
        # are evaluated by the likelihood), hence the separate mc_w
        mc_w = gpm.query_coords(state, cfg, mc_points)
        V, var = posterior_batch(cfg.kernel, gpm.train_coords(state, cfg),
                                 state.mask(), state.chol,
                                 mc_w, ls, amp, cfg.noise)
        idx, vals = wip_greedy_batch(cfg.kernel, mc_w, V, var, ls, amp,
                                     cfg.noise, state.y_std, use_std, n_batch)
        return mc_points[idx], vals

    return jax.jit(run)


@lru_cache(maxsize=32)
def _wip_refine_core(cfg: gpm.GPTrainConfig, use_std: bool, maxiter: int):
    """Jitted local polish of the best pool candidate (reference
    acquisition.py:400-412), differentiating through the fantasy variance."""

    def objective(state, x, mc_points, V, var):
        ls, amp = jnp.exp(state.log_ls), jnp.exp(state.log_amp)
        # kernel math in WARP space: V/var/state.chol come from the sweep
        # core, which built them from warped coordinates — raw-space kernels
        # against a warp-space Cholesky would make the polish meaningless
        # (and spuriously small values would win the <= acq_min gate). The
        # optimization variable x stays raw; the warp is differentiable.
        x_w = gpm.query_coords(state, cfg, x[None, :])[0]
        mc_w = gpm.query_coords(state, cfg, mc_points)
        fv = fantasy_var_single(cfg.kernel, gpm.train_coords(state, cfg),
                                state.mask(), state.chol,
                                x_w, mc_w, V, var, ls, amp, cfg.noise)
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
        # gate on the GP ROW count: a classifier-GP's npoints is the full
        # dataset incl. rejects (reference gates on gp.train_x.shape[0],
        # acquisition.py:400) — the full count would disable the polish and
        # force the pool-only path far too early in clf runs
        if n_batch <= 1 or getattr(gp, "gp_size", gp.npoints) <= REFINE_MAX_N:
            return super().get_next_batch(
                gp, n_batch=n_batch, acq_kwargs=acq_kwargs, maxiter=maxiter,
                n_restarts=n_restarts, verbose=verbose,
                early_stop_patience=early_stop_patience, rng=rng)

        rng = rng if rng is not None else get_numpy_rng()
        acq_kwargs = dict(acq_kwargs or {})
        mc_samples = acq_kwargs.get("mc_samples")
        mc_points_size = int(acq_kwargs.get("mc_points_size", 128))
        mc_points = jnp.asarray(get_mc_points(
            mc_samples, mc_points_size=mc_points_size, rng=rng, gp=gp))
        from .parallel.mesh import production_mesh

        core = _wip_batch_core(gp.cfg, self._use_std, int(n_batch),
                               SWEEP_DTYPE, production_mesh())
        pts, vals = core(gp.state, mc_points)
        pts, vals = jax.device_get((pts, vals))  # one bundled transfer
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
        mc_np = np.asarray(get_mc_points(mc_samples,
                                         mc_points_size=mc_points_size,
                                         rng=rng, gp=gp))
        mc_points = jnp.asarray(mc_np)
        from .parallel.mesh import production_mesh

        sweep = _wip_sweep_core(gp.cfg, self._use_std, SWEEP_DTYPE,
                                production_mesh())
        acq_vals, V, var = sweep(gp.state, mc_points)
        # one transfer of the (n_mc,) value vector instead of argmin +
        # per-element fetches (latency-priced round-trips)
        acq_np = jax.device_get(acq_vals)
        i_best = int(np.argmin(acq_np))
        acq_min = float(acq_np[i_best])
        x0_np = mc_np[i_best]
        log.debug(f"{self.name} min over MC pool: {acq_min:.4e}")

        # skip polish at large N (reference :400); GP ROW count, not the
        # clf-GP's full dataset size (see get_next_batch)
        if getattr(gp, "gp_size", gp.npoints) > REFINE_MAX_N:
            return x0_np, acq_min

        refine = _wip_refine_core(gp.cfg, self._use_std, int(maxiter))
        x, f = jax.device_get(refine(gp.state, jnp.asarray(x0_np)[None, :],
                                     mc_points, V, var))
        if float(f) <= acq_min:
            return np.asarray(x), float(f)
        return x0_np, acq_min


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

def get_mc_samples(gp, warmup_steps=None, num_samples=1024, thinning=None,
                   method="NUTS", num_chains=None, np_rng=None, rng_key=None,
                   warm_state=None):
    """Posterior MC samples of the GP surrogate (reference acquisition.py:468).

    'EHMC' -> lockstep ensemble HMC (the TPU-native default refresh: 64
    persistent chains batched on the MXU, infer/ehmc.py); 'NUTS' -> on-device
    NUTS chains; 'NS' -> on-device vectorized nested sampling (cheap
    settings); 'uniform' -> scrambled Sobol in the unit cube.
    ``warmup_steps`` / ``thinning`` / ``num_chains`` default to None =
    method-appropriate defaults (NUTS: dimension-scaled warmup, thinning 4,
    4 chains; EHMC: 64 chains, short cold warmup, thinning 2) — the two
    samplers invert the chains-vs-steps trade, so one number cannot serve
    both. Explicit values are forwarded to whichever sampler runs.
    ``warm_state``: previous NUTS/EHMC call's adapted kernel (see
    samplers.sample_gp_nuts / sample_gp_ensemble) for cheap cross-iteration
    re-warming.
    """
    if method == "EHMC":
        from .samplers import sample_gp_ensemble

        return sample_gp_ensemble(gp, num_samples=num_samples,
                                  num_chains=num_chains or 64,
                                  warmup_steps=warmup_steps,
                                  thinning=thinning,
                                  np_rng=np_rng, rng_key=rng_key,
                                  warm_state=warm_state)
    if method == "NUTS":
        from .samplers import sample_gp_nuts

        return sample_gp_nuts(gp, warmup_steps=warmup_steps,
                              num_samples=num_samples, thinning=thinning,
                              num_chains=num_chains or 4, np_rng=np_rng,
                              rng_key=rng_key, warm_state=warm_state)
    elif method == "NS":
        from .samplers import nested_sampling

        samples, _, _ = nested_sampling(gp, mode="acq", dlogz=0.02,
                                        equal_weights=True, rng=np_rng,
                                        rng_key=rng_key)
        return samples
    elif method == "uniform":
        from scipy.stats import qmc

        rng = np_rng if np_rng is not None else get_numpy_rng()
        pts = qmc.Sobol(gp.ndim, scramble=True, rng=rng).random(num_samples)
        return {"x": pts}
    raise ValueError(f"Unknown MC sample method '{method}'")


# Mode-balanced pool subsampling (on by default; BOBE_TPU_MODE_BALANCE=0
# disables — like SWEEP_DTYPE, the env var is read ONCE at import, so it
# must be set before `import bobe_tpu`; change the module attribute to
# toggle afterwards). Valley depth (in log-posterior) below which two
# clusters count as the same mode.
MODE_BALANCE = _os.environ.get("BOBE_TPU_MODE_BALANCE", "1") != "0"
MODE_VALLEY_DEPTH = 2.0


def _mode_labels(gp, x, rng, max_modes: int = 8) -> np.ndarray:
    """Cluster the MC pool into posterior modes, merging clusters that are
    not separated by a deep log-density valley.

    KMeans over-segments on purpose (k up to ``max_modes``); two clusters
    are then merged when the GP mean at the midpoint of their centers is
    within MODE_VALLEY_DEPTH nats of the lower center — a unimodal posterior
    collapses back to ONE mode (no behavior change), while genuinely
    separated modes (deep valleys) stay distinct. Cheap: one small KMeans +
    one batched GP predict on ~k + k(k-1)/2 points.
    """
    n = x.shape[0]
    k = int(min(max_modes, max(1, n // 32)))
    if k <= 1:
        return np.zeros(n, dtype=int)
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=k, n_init=4,
                random_state=int(rng.integers(2**31 - 1))).fit(x)
    labels = np.asarray(km.labels_)
    centers = np.asarray(km.cluster_centers_)

    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    mids = np.asarray([(centers[i] + centers[j]) / 2 for i, j in pairs])
    query = np.vstack([centers, mids])
    mean = np.asarray(gp.predict_mean_batched(jnp.asarray(query)))
    c_mean, m_mean = mean[:k], mean[k:]

    parent = list(range(k))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (i, j), mm in zip(pairs, m_mean):
        if mm >= min(c_mean[i], c_mean[j]) - MODE_VALLEY_DEPTH:
            parent[find(i)] = find(j)
    remap = {}
    merged = np.empty(n, dtype=int)
    for c in range(k):
        root = find(c)
        remap.setdefault(root, len(remap))
    for idx in range(n):
        merged[idx] = remap[find(labels[idx])]
    return merged


def _balanced_choice(labels, n_pick, rng) -> np.ndarray:
    """Indices of a per-mode balanced subsample: equal target share per mode
    (capped at mode occupancy), leftovers redistributed proportionally."""
    modes, counts = np.unique(labels, return_counts=True)
    C = len(modes)
    take = np.minimum(counts, n_pick // C)
    left = n_pick - int(take.sum())
    if left > 0:
        room = counts - take
        if room.sum() > 0:
            extra = np.floor(left * room / room.sum()).astype(int)
            take = np.minimum(counts, take + extra)
            # round-robin the last few slots to the roomiest modes
            for c in np.argsort(-(counts - take)):
                if take.sum() >= n_pick:
                    break
                if take[c] < counts[c]:
                    take[c] += 1
    idx = []
    for m, c, t in zip(modes, counts, take):
        members = np.flatnonzero(labels == m)
        idx.append(rng.choice(members, size=int(t), replace=False))
    return np.concatenate(idx)


def get_mc_points(mc_samples, mc_points_size=128, rng=None, gp=None):
    """Subsample the MC pool without replacement (reference :485-489).

    With ``gp`` given and mode balancing on, the subsample is stratified
    per posterior mode (see :func:`_mode_labels`): the WIP acquisition
    averages fantasy variance over these points, so a dominant mode in the
    pool would otherwise starve minority modes of acquisition weight — the
    shared failure floor of the reference on multimodal targets
    (Himmelblau |dlogZ| ~ 0.1-0.3 at small budgets). Labels are computed
    once per pool refresh and cached on the mc_samples dict.
    """
    rng = rng if rng is not None else get_numpy_rng()
    x = np.asarray(mc_samples["x"])
    n = x.shape[0]
    if n <= mc_points_size:
        return x
    if MODE_BALANCE and gp is not None and isinstance(mc_samples, dict):
        labels = mc_samples.get("_mode_labels")
        if labels is None or len(labels) != n:
            labels = _mode_labels(gp, x, rng)
            mc_samples["_mode_labels"] = labels
        if labels.max() > 0:
            return x[_balanced_choice(labels, mc_points_size, rng)]
    idx = rng.choice(n, size=mc_points_size, replace=False)
    return x[idx]
