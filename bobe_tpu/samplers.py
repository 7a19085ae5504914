"""Surrogate samplers: nested sampling and NUTS over the GP mean.

Reference-compatible entry points (cf. /root/reference/BOBE/samplers.py):

* ``nested_sampling(gp, mode=...)`` — replaces ``nested_sampling_Dy``. The
  sampler itself is the on-device batched NS of infer/nested.py (dynesty's
  host loop was the reference's dominant accelerator bottleneck); the logZ
  uncertainty construction (re-integrating logl +/- sigma_GP over the dead
  volumes plus the variance integral) matches samplers.py:172-185 exactly.
* ``sample_gp_nuts(gp, ...)`` — replaces ``sample_GP_NUTS``; in-house NUTS
  (infer/nuts.py) on the logit-transformed unit cube, chains vmapped so the
  GP-mean evaluations batch onto the MXU instead of pmap-per-device
  (reference samplers.py:304-349).

Both cache their jitted cores per GP configuration and take the GP state as a
traced argument, so the BO loop never retraces them between iterations.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .infer import integrals
from .infer.nested import run_nested, run_nested_dynamic
from .infer.nuts import run_chain
from .models import gp as gpm
from .utils.core import renormalise_log_weights, resample_equal
from .utils.log import get_logger
from .utils.seed import get_new_jax_key, get_numpy_rng

log = get_logger("sampler")


# --------------------------------------------------------------- GP adapters

@lru_cache(maxsize=32)
def _mean_apply(cfg: gpm.GPTrainConfig, gated: bool, prob_threshold: float,
                minus_inf: float, clf_kind: str):
    """Stable batched GP-mean function (m, d) -> (m,), classifier-gated when
    the surrogate carries a feasibility classifier (clf_gp semantics)."""
    if not gated:
        def apply(ctx, x):
            return gpm.predict_mean(ctx, cfg, x)
        return apply

    from .models.classifiers import predict_proba_apply

    clf_apply = predict_proba_apply(clf_kind)

    def apply(ctx, x):
        state, clf_params = ctx
        mean = gpm.predict_mean(state, cfg, x)
        probs = clf_apply(clf_params, x)
        return jnp.where(probs >= prob_threshold, mean, minus_inf)

    return apply


def _gp_loglike(gp) -> Tuple:
    """Returns (apply_fn, ctx) for the GP's (possibly gated) mean."""
    clf = getattr(gp, "_clf_ctx", None)  # set by GPwithClassifier when active
    if clf is not None:
        apply = _mean_apply(gp.cfg, True, float(gp.probability_threshold),
                            float(gp.minus_inf), gp.clf_type)
        return apply, (gp.state, clf)
    apply = _mean_apply(gp.cfg, False, 0.0, 0.0, "")
    return apply, gp.state


# ------------------------------------------------------------ nested sampling

def ns_settings(mode: str, ndim: int) -> Tuple[int, float, int]:
    """(nlive, dlogz, maxcall) per mode (reference samplers.py:119-125)."""
    if mode == "acq":
        return max(100, min(500, 20 * ndim)), 0.1, int(2e6)
    return max(500, 40 * ndim), 0.01, int(5e6)


def _seed_live_points(gp, loglike, nlive, ndim, rng):
    """Classifier-aware live seeding with exact plateau volume accounting.

    The classifier-gated surrogate is a minus_inf PLATEAU over most of the
    prior; running NS with plateau points in the live set and the standard
    exponential shrinkage biases logZ up by -f - log(1-f) (f = infeasible
    prior fraction; ~ +0.8 at f ~ 0.8). The reference leaves this to
    dynesty's plateau handling (its rejection seeding, samplers.py:129-151,
    feeds dynesty which shrinks plateaus linearly). Here the live set is
    rejection-seeded strictly inside the feasible region and the shrinkage
    ledger starts at log(f_feasible) — the exact restricted-support
    treatment: f_hat from the uniform proposal pool is the binomial MLE of
    the feasible fraction.

    Returns (live_x, live_logl, logvol0, var_logvol0); the fallback (too few
    feasible points found) reverts to the reference's mixed live set with
    logvol0 = 0.
    """
    maxtries = 20
    nlogl = 5000 * ndim
    floor = float(getattr(gp, "minus_inf", -np.inf))

    def _loglike_chunked(x):
        # 5000*d proposals per try: one device call at that size OOMs HBM at
        # large caps (see config.predict_chunk) — evaluate in bounded chunks
        chunk = config.predict_chunk() or x.shape[0]
        return np.concatenate([
            np.asarray(loglike(jnp.asarray(x[i:i + chunk])))
            for i in range(0, x.shape[0], chunk)])

    feas_x, feas_l = [], []
    n_drawn = n_feas = 0
    for _ in range(maxtries):
        x = rng.uniform(size=(nlogl, ndim))
        logl = _loglike_chunked(x)
        ok = logl > floor
        n_drawn += nlogl
        n_feas += int(ok.sum())
        feas_x.append(x[ok]), feas_l.append(logl[ok])
        if n_feas >= nlive:
            break
    fx, fl = np.concatenate(feas_x), np.concatenate(feas_l)
    if n_feas >= nlive:
        idx = rng.choice(n_feas, size=nlive, replace=False)
        if not np.all(fl[idx] == fl[idx][0]):  # the RETURNED subset varies
            f_hat = n_feas / n_drawn
            # binomial delta-method error of log(f_hat)
            var_logvol0 = (1.0 - f_hat) / (n_drawn * f_hat)
            return fx[idx], fl[idx], float(np.log(f_hat)), float(var_logvol0)
    # fall back: reference-style mixed live set with no volume shift. KEEP
    # every feasible point already found (a previous version redrew a fresh
    # pool and discarded up to nlive-1 feasible points it was holding,
    # starting NS from an essentially all-plateau live set) and top up with
    # fresh uniform draws — drawn directly at the needed size, so nlive
    # larger than the proposal pool cannot crash the choice().
    if n_feas < nlive:
        log.warning(
            f"live seeding found only {n_feas}/{n_drawn} feasible points; "
            "falling back to a mixed live set (logZ may carry plateau bias)")
    else:
        log.warning(
            "live seeding found enough feasible points but their logl is "
            "constant; mixed live set, logZ may carry plateau bias")
    n_keep = min(n_feas, nlive)
    lx = np.empty((nlive, ndim))
    ll = np.empty(nlive)
    lx[:n_keep], ll[:n_keep] = fx[:n_keep], fl[:n_keep]
    if n_keep < nlive:
        x = rng.uniform(size=(nlive - n_keep, ndim))
        lx[n_keep:] = x
        ll[n_keep:] = _loglike_chunked(x)
    if np.all(ll == ll[0]):
        pt = gp.get_random_point(rng=rng, nstd=1.0)
        lx[0] = pt
        ll[0] = float(loglike(jnp.asarray(pt)[None, :])[0])
    return lx, ll, 0.0, 0.0


def nested_sampling(gp, mode: str = "acq", ndim: Optional[int] = None,
                    dlogz: Optional[float] = None, dynamic: bool = False,
                    maxcall: Optional[int] = None, equal_weights: bool = False,
                    rng=None, rng_key=None, nlive: Optional[int] = None,
                    merge_with: Optional[list] = None, n_runs: int = 1,
                    **ns_kwargs) -> Tuple[Dict, Dict, bool]:
    """Nested sampling over the GP surrogate.

    Returns (samples_dict, logz_dict, success) with the reference's schema
    (samplers.py:185-194): logz_dict carries mean/upper/lower/var/std/
    dlogz_sampler; samples carry x/weights/logl/best/method (plus ``raw``,
    the run's (dead_x, dead_logl, nlive_schedule, bound) tuple for later
    merging). ``nlive`` overrides the per-mode default (reference
    samplers.py:119-125).

    ``merge_with``: optional list of ``raw`` tuples from PREVIOUS runs over
    the SAME GP state — the new run is combined with them at the dead-point
    level (dynesty's varying-live-count merge, infer/nested.merge_runs), so
    the reported evidence uses ALL the NS work instead of only the last
    pass: sampler noise drops by ~sqrt(total live points / new live points).
    Merging runs from different GP states is invalid (their logl values
    disagree) — callers must only pass runs taken since the last GP update.
    For classifier-gated surrogates the merged ledger starts at the pooled
    feasible-fraction estimate; individual runs' independent f_hat draws
    differ by O(sqrt(var_logvol0)) ~ 1e-2, already accounted inside the
    reported var/upper/lower widening below.

    ``n_runs``: run the sampler ``n_runs`` times at the SAME static
    configuration (fresh PRNG keys, fresh live seeding) and merge all runs at
    the dead-point level. Merging b independent runs of nlive live points is
    statistically equivalent to one run at b*nlive (sampler noise drops by
    sqrt(b); dynesty's merge theory) — but it REUSES the already-compiled NS
    graph, whereas nlive=b*nlive_base is a brand-new static shape whose
    mega-graph compile costs minutes on relay/tunneled TPUs (measured: 65 s
    for the GP-backed convergence loop on a quiet relay, 460+ s congested;
    the run itself is ~1 s steady-state at d=6). The final-precision passes
    in bo.py use this instead of boosting nlive.
    """
    ndim = ndim if ndim is not None else gp.ndim
    nlive_default, dlogz_default, maxcall_default = ns_settings(mode, ndim)
    nlive = nlive if nlive is not None else nlive_default
    dlogz = dlogz if dlogz is not None else dlogz_default
    if mode == "acq":
        equal_weights = True
    elif "n_repeats" not in ns_kwargs and ndim >= 10:
        # High-d decorrelation: at 1.5d slice repeats the replacements stay
        # correlated with their clone parents and logZ is biased up to +0.4
        # at d=30 and +0.24 at d=15 (measured on TRUE analytic targets —
        # Gaussian and planck-like; 3d repeats bring the multi-seed means to
        # ~-0.03, BENCH_NOTES round 3; d=8 is unbiased at 1.5d). The
        # acq-mode pool refresh keeps the cheap default — the WIP average is
        # insensitive.
        ns_kwargs["n_repeats"] = int(np.ceil(3.0 * ndim))
    if maxcall is None:
        # the call budget must scale with the work a converged run actually
        # needs: iterations-to-convergence ~ H * nlive / kills and H (the
        # information) grows with d, so a d-independent multiple of
        # nlive * reps under-budgets exactly the high-d convergence runs.
        # Measured: a fixed 5e6 truncated d=30 runs at ~60% depth (round 3),
        # and 100 * nlive * reps (10.8M at d=30/nlive=1200/reps=90) still
        # truncated at n_iter 347 of the ~430 + tail needed (~17M calls,
        # round 5) — the d-term below gives 27M there (1.6x headroom) while
        # leaving converged low-d runs untouched (maxcall is a ceiling, not
        # a driver; raising it never slows a run that reaches dlogz).
        reps = int(ns_kwargs.get("n_repeats") or max(3, np.ceil(1.5 * ndim)))
        maxcall = max(maxcall_default, (100 + 5 * ndim) * int(nlive) * reps)

    rng = rng if rng is not None else get_numpy_rng()
    key = rng_key if rng_key is not None else get_new_jax_key()

    apply_fn, ctx = _gp_loglike(gp)
    loglike = lambda x: apply_fn(ctx, x)

    # multi-chip: shard the proposal-batch GP evaluations over the mesh
    from .parallel.mesh import production_mesh

    ns_kwargs.setdefault("mesh", production_mesh())

    live_x = live_logl = None
    logvol0, var_logvol0 = 0.0, 0.0
    if getattr(gp, "use_clf", False):
        live_x, live_logl, logvol0, var_logvol0 = _seed_live_points(
            gp, loglike, nlive, ndim, rng)

    runner = run_nested_dynamic if dynamic else run_nested
    # dynamic=True: dynesty DynamicNestedSampler semantics (reference
    # bo.py:1346-1367): static base pass + posterior-bulk refinement batch,
    # merged with the varying-live-count volume schedule
    # (infer/nested.run_nested_dynamic)
    n_runs = max(1, int(n_runs))
    keys = list(jax.random.split(key, n_runs)) if n_runs > 1 else [key]
    results, lv0s, vlv0s = [], [], []
    for i, k in enumerate(keys):
        if i > 0 and getattr(gp, "use_clf", False):
            # independent live seeding per repeat (each run must be an
            # independent NS realization for the merge noise scaling to hold)
            live_x, live_logl, logvol0, var_logvol0 = _seed_live_points(
                gp, loglike, nlive, ndim, rng)
        res = runner(apply_fn, ctx, ndim, k, nlive=nlive, dlogz=dlogz,
                     maxcall=maxcall, live_x=live_x, live_logl=live_logl,
                     rng=rng, logvol0=logvol0, **ns_kwargs)
        log.debug(f"NS: {res.n_iter} iters, {res.n_calls} surrogate calls, "
                  f"{len(res.dead_logl)} points, quick logz={res.logz:.3f}")
        if n_runs > 1 and not res.success:
            log.warning(f"NS repeat {i + 1}/{n_runs} failed; dropping it "
                        "from the merge")
            continue
        results.append(res)
        lv0s.append(logvol0)
        vlv0s.append(var_logvol0)
    if not results:  # every repeat failed: preserve single-run failure path
        results, lv0s, vlv0s = [res], [logvol0], [var_logvol0]
    res = results[-1]
    # pooled seed-volume estimate across repeats (independent binomial MLEs
    # of the same feasible fraction: mean of the logs, variance / n)
    logvol0 = float(np.mean(lv0s))
    var_logvol0 = float(np.mean(vlv0s)) / len(vlv0s)

    # raw-run tuples for dead-point-level merging (see merge_with)
    raws = [(np.asarray(r.dead_x), np.asarray(r.dead_logl),
             np.asarray(r.nlive_schedule, dtype=float), -np.inf)
            for r in results]
    merge_list = (list(merge_with) if merge_with else []) + raws
    if len(merge_list) > 1:
        from .infer.nested import merge_runs

        dead_x, dead_logl, logvol_arr, n_at_death = merge_runs(
            merge_list, logvol0=logvol0)
        raw = (dead_x, dead_logl, n_at_death, -np.inf)
        err_nlive = n_at_death
        log.debug(f"NS merge: combined {len(merge_list)} runs -> "
                  f"{len(dead_logl)} points, peak live count "
                  f"{float(np.max(n_at_death)):.0f}")
    else:
        raw = raws[0]
        dead_x, dead_logl, logvol_arr = res.dead_x, res.dead_logl, res.logvol
        # dynamic runs have region-dependent live counts (base+batch overlap
        # only in the posterior bulk) — the per-death schedule is the honest
        # error denominator there; static runs keep the classic H/nlive
        err_nlive = (res.nlive_schedule
                     if dynamic and res.nlive_schedule is not None
                     else res.nlive)

    # ---- evidence + GP-uncertainty bounds (reference samplers.py:172-185)
    var = np.asarray(gp.predict_var_batched(jnp.asarray(dead_x)))
    sigma = np.sqrt(np.clip(var, 0.0, None))
    # LOO calibration: the GP posterior sd can underestimate actual errors
    # (hyperparameters are point-fit); scale sigma by the RMS leave-one-out
    # z-score when it exceeds 1 so the reported bounds (and the convergence
    # delta built from them) keep honest coverage. Never shrink (kappa<1 is
    # left alone — conservative). Measured trigger: a planck-like seed
    # declared delta<0.05 while truly off by 0.18 (BENCH_NOTES round 3).
    # The reference reports raw GP-sigma bounds and shares this failure.
    if hasattr(gp, "loo_z_rms"):
        kappa = float(gp.loo_z_rms())
        if np.isfinite(kappa) and kappa > 1.0:
            sigma = sigma * min(kappa, 5.0)
            log.debug(f"LOO calibration: sigma scaled by {min(kappa, 5.0):.2f}")
    logz_dict = integrals.logz_bounds_from_gp_sigma(dead_logl, logvol_arr,
                                                    sigma, lv_start=logvol0)
    h, logzerr = integrals.information_and_err(dead_logl, logvol_arr,
                                               logz_dict["mean"], err_nlive,
                                               lv_start=logvol0)
    # the feasible-fraction estimate carries its own (binomial) uncertainty;
    # widen upper/lower too so the (upper-lower)/2 convergence delta sees it
    # (it is ~1e-2 at typical draw counts, but must not be silently dropped)
    sig0 = float(np.sqrt(var_logvol0))
    # GP-only half-width BEFORE the sig0 widening: err_total must combine
    # independent terms exactly once, and var_logvol0 already lives inside
    # dlogz_sampler below — widening upper/lower AND the sampler term would
    # double-count the seed-volume variance (advisor round 4).
    gp_half_width = float(0.5 * (logz_dict["upper"] - logz_dict["lower"]))
    logz_dict["var"] += var_logvol0
    logz_dict["upper"] += sig0
    logz_dict["lower"] -= sig0
    logz_dict["std"] = float(2.0 * np.sqrt(logz_dict["var"]))
    logz_dict["dlogz_sampler"] = float(np.sqrt(logzerr**2 + var_logvol0))
    logz_dict["h"] = h
    # hyperparameter-fit uncertainty (BEYOND-reference: the reference
    # reports raw GP-sigma bounds, samplers.py:172-185, and point-fits its
    # hyperparameters): re-integrate the evidence under each distinct fit
    # basin's GP mean over the SAME dead-point volumes; the MLL-weighted
    # spread of those logZ values is an independent error term. One fit
    # basin (the common case) contributes exactly 0.
    dlogz_hyp = 0.0
    # acq-mode runs feed the MC candidate pool, not the reported evidence —
    # skip the per-basin refresh + re-predict there (it would otherwise run
    # every iteration for mc_points_method='NS' users)
    basins = (getattr(gp, "hyp_basins", lambda: [])()
              if mode != "acq" else [])
    if len(basins) >= 2:
        try:
            from scipy.special import logsumexp as _lse

            nmll0 = basins[0][1]
            lzs, lw = [], []
            for params, nmll in basins:
                mu = np.asarray(gp.predict_mean_with_params(
                    params, jnp.asarray(dead_x)))
                lwt = integrals.logwt_from(mu, logvol_arr, lv_start=logvol0)
                lzs.append(float(_lse(lwt)))
                lw.append(-(nmll - nmll0))  # log posterior weight (flat
                #                             prior over the basin set)
            w = np.exp(np.asarray(lw) - np.max(lw))
            w /= w.sum()
            lz = np.asarray(lzs)
            mean_w = float(np.sum(w * lz))
            dlogz_hyp = float(np.sqrt(np.sum(w * (lz - mean_w) ** 2)))
            if dlogz_hyp > 0.01:
                log.debug(f"hyperparameter-basin logZ spread: "
                          f"{dlogz_hyp:.4f} over {len(basins)} basins")
        except Exception as e:  # an estimate must never kill the run
            log.debug(f"dlogz_hyp estimation failed (ignored): {e!r}")
    logz_dict["dlogz_hyp"] = dlogz_hyp
    # the honest user-facing error bar: GP-surrogate uncertainty (half the
    # re-integrated logl +/- sigma bound width — what the convergence rule
    # thresholds), NS sampler noise, and hyperparameter-fit spread are
    # INDEPENDENT error sources; at converged-GP scales the sampler term
    # dominates (round-4 10-seed planck-like campaign: GP delta ~0.03,
    # sampler 0.052; |dlogZ| covered 9/10 by the quadrature sum but only
    # 4/10 by the GP delta alone — the hyp term targets the residual miss)
    logz_dict["err_total"] = float(np.sqrt(
        gp_half_width ** 2 + logz_dict["dlogz_sampler"] ** 2
        + dlogz_hyp ** 2))

    logwt = integrals.logwt_from(dead_logl, logvol_arr, lv_start=logvol0)
    weights = renormalise_log_weights(logwt)
    samples_x, logl = dead_x, dead_logl
    success = res.success and not np.all(logl == logl[0])
    best_pt = samples_x[np.argmax(logl)]
    if equal_weights:
        samples_x, logl = resample_equal(samples_x, logl, weights=weights, rng=rng)
        weights = np.ones(samples_x.shape[0])
    samples_dict = {"x": samples_x, "weights": weights, "logl": logl,
                    "best": best_pt, "method": "nested", "raw": raw}
    return samples_dict, logz_dict, success


# ----------------------------------------------------------------------- NUTS

def _maybe_shard_chains(arr):
    """Lay the leading (chain) axis of ``arr`` out over the production mesh
    when one is active and divides it — the TPU-native replacement for the
    reference's pmap chain dispatch (samplers.py:304-349). jit honors
    committed input shardings, so the cached runners need no mesh plumbing."""
    from .parallel.mesh import batch_sharded, production_mesh

    mesh = production_mesh()
    if mesh is not None and arr.shape[0] % mesh.size == 0:
        return jax.device_put(arr, batch_sharded(mesh))
    return arr


def _mesh_aligned_chains(num_chains: int) -> int:
    """Round the chain count UP to a multiple of the production mesh size.

    Without this the default 4-chain final-samples NUTS runs on a single
    device of an 8-chip mesh (_maybe_shard_chains skips non-divisible
    layouts). The reference dispatched chains across devices including the
    devices >= chains case (/root/reference/BOBE/samplers.py:304-349); here
    extra chains are free parallel work and only enlarge the sample pool.
    """
    from .parallel.mesh import production_mesh

    mesh = production_mesh()
    if mesh is None or num_chains % mesh.size == 0:
        return int(num_chains)
    return int(-(-num_chains // mesh.size) * mesh.size)


def get_hmc_settings(ndim, warmup_steps=None, num_samples=None, thinning=None):
    """Dimension-based defaults (reference samplers.py:196-214)."""
    warmup_steps = warmup_steps if warmup_steps is not None else (256 if ndim <= 9 else 512)
    num_samples = num_samples if num_samples is not None else (1024 if ndim <= 9 else 2048)
    thinning = thinning if thinning is not None else 4
    return warmup_steps, num_samples, thinning


@lru_cache(maxsize=32)
def _nuts_logprob_apply(cfg: gpm.GPTrainConfig, gated: bool, prob_threshold: float,
                        minus_inf: float, clf_kind: str, temp: float):
    """Target density on R^d: logit-transformed Uniform(0,1)^d prior plus the
    (tempered) GP mean — the same model as the reference's numpyro program
    (samplers.py:268-276)."""
    mean_apply = _mean_apply(cfg, gated, prob_threshold, minus_inf, clf_kind)

    def apply(ctx, z):
        x = jax.nn.sigmoid(z)
        mean = mean_apply(ctx, x[None, :])[0]
        # log|dx/dz| = sum log sigmoid'(z) = -(softplus(z) + softplus(-z));
        # the softplus form stays finite AND differentiable when the sigmoid
        # saturates (log(x)+log1p(-x) NaNs in the gradient at x -> 0/1,
        # which froze chains whose step-size search overshot the box)
        log_jac = -jnp.sum(jax.nn.softplus(z) + jax.nn.softplus(-z))
        return mean / temp + log_jac

    return apply


@lru_cache(maxsize=32)
def _nuts_runner(apply, warmup_steps, num_samples, thinning, dense_mass,
                 max_depth, warm: bool = False):
    """Cached jitted vmapped chain runner — rebuilding the vmap wrapper per
    call costs seconds of host-side retracing in the BO loop. ``warm=True``
    builds the fixed-mass variant taking a per-chain (eps, mass_inv,
    mass_chol) warm tuple."""
    from functools import partial as _partial

    if warm:
        def _warm_chain(ctx, init_z, key, warm_tuple):
            return run_chain(apply, ctx, init_z, key,
                             num_warmup=warmup_steps,
                             num_samples=num_samples, thinning=thinning,
                             dense_mass=dense_mass, max_depth=max_depth,
                             warm=warm_tuple, adapt_mass=False)

        return jax.jit(jax.vmap(_warm_chain, in_axes=(None, 0, 0, 0)))
    return jax.jit(jax.vmap(
        _partial(run_chain, apply, num_warmup=warmup_steps,
                 num_samples=num_samples, thinning=thinning,
                 dense_mass=dense_mass, max_depth=max_depth),
        in_axes=(None, 0, 0)))


def _gated_apply_ctx(gp, temp):
    """(clf, tempered logprob apply, ctx) — classifier-gated when active.
    Shared by the NUTS and ensemble refreshes so the gating selection can
    never drift between them."""
    clf = getattr(gp, "_clf_ctx", None)
    if clf is not None:
        apply = _nuts_logprob_apply(gp.cfg, True,
                                    float(gp.probability_threshold),
                                    float(gp.minus_inf), gp.clf_type,
                                    float(temp))
        return clf, apply, (gp.state, clf)
    return (None, _nuts_logprob_apply(gp.cfg, False, 0.0, 0.0, "", float(temp)),
            gp.state)


def _cold_logit_inits(gp, num_chains, np_rng):
    """Chain inits: random points + the incumbent (reference
    samplers.py:296-300), mapped to logit space. Built lazily — unused on
    the warm path."""
    inits = [gp.get_random_point(rng=np_rng)
             for _ in range(max(0, num_chains - 1))]
    best_x = np.asarray(gp.train_x[int(np.argmax(np.asarray(gp.train_y)))])
    inits.append(best_x)
    inits = np.clip(np.asarray(inits[:num_chains]), 1e-6, 1 - 1e-6)
    return jnp.asarray(np.log(inits) - np.log1p(-inits))


def _warm_state_matches(warm_state, kind, num_chains, ndim, dense_mass, temp,
                        default_kind=None) -> bool:
    """Kernel-reuse validity. Shapes AND temperature must match exactly — a
    kernel adapted to a differently-tempered target would pass the acceptance
    guard on a smooth temperature change while carrying residual burn-in
    bias."""
    return (warm_state is not None
            and warm_state.get("kind", default_kind) == kind
            and warm_state.get("num_chains") == num_chains
            and warm_state.get("ndim") == ndim
            and warm_state.get("dense_mass") == bool(dense_mass)
            and warm_state.get("temp") == float(temp))


@lru_cache(maxsize=32)
def _batched_apply(apply):
    """Cached jit of the vmapped logprob apply. The applies are themselves
    lru-cached (_nuts_logprob_apply), so the function object is a stable
    cache key; without this the plateau check rebuilt and executed an
    UN-jitted vmap of the full gated GP graph every warm refresh — op-by-op
    dispatch, latency-priced per op on tunneled TPUs."""
    return jax.jit(jax.vmap(apply, in_axes=(None, 0)))


def _plateau_frac_ok(apply, ctx, warm_state, gp, temp) -> float:
    """Fraction of cached chain ends still feasible. The classifier retrains
    between iterations and can strand ends on the minus_inf plateau, where
    the acceptance guard is blind (zero gradient, all proposals equal-logp).
    apply() returns the TEMPERED logp — the plateau sits at ~minus_inf/temp,
    so the threshold is tempered too (an untempered 0.5*minus_inf would wave
    infeasible starts through for any temp > 2)."""
    start_lp = np.asarray(_batched_apply(apply)(
        ctx, jnp.asarray(warm_state["last_z"])))
    return float(np.mean(start_lp > 0.5 * float(gp.minus_inf) / float(temp)))


def _warm_kernel_tuple(warm_state):
    return (jnp.asarray(warm_state["step_size"]),
            jnp.asarray(warm_state["mass_inv"]),
            jnp.asarray(warm_state["mass_chol"]))


def _bundle_samples(gp, clf, ctx, zs, diag, kind, num_chains, dense_mass,
                    temp) -> Dict:
    """ONE bundled device->host transfer for the refresh outputs (serial
    per-array fetches are latency-priced on tunneled TPUs, and the refresh
    runs every BO iteration), packed into the reference samples_dict schema
    (x / logp / best / method) plus warm_state. The 'logp' entry recovers the
    untempered GP mean at the samples (the reference's 'logp' deterministic,
    samplers.py:276): the jacobian term is subtracted."""
    xs = jax.nn.sigmoid(zs.reshape(-1, gp.ndim))
    mean_apply = _mean_apply(gp.cfg, clf is not None,
                             float(getattr(gp, "probability_threshold", 0.0)),
                             float(getattr(gp, "minus_inf", 0.0)),
                             getattr(gp, "clf_type", "") if clf is not None else "")
    f = jax.device_get({
        "xs": xs, "logp": mean_apply(ctx, xs),
        "diag": {k: v for k, v in diag.items()
                 if k in ("mean_accept", "n_divergent", "step_size")},
        "warm": {k: diag[k]
                 for k in ("step_size", "mass_inv", "mass_chol", "last_z")}})
    xs, logp_mean = f["xs"], f["logp"]
    return {"x": xs, "logp": logp_mean, "best": xs[np.argmax(logp_mean)],
            "method": "MCMC", "diagnostics": f["diag"],
            "warm_state": {**f["warm"], "kind": kind,
                           "num_chains": num_chains, "ndim": gp.ndim,
                           "dense_mass": bool(dense_mass),
                           "temp": float(temp)}}


def sample_gp_nuts(gp, np_rng=None, rng_key=None, num_chains: int = 4,
                   temp: float = 1.0, dense_mass: bool = True,
                   max_tree_depth: int = 6, warm_state: Optional[Dict] = None,
                   **kwargs) -> Dict:
    """NUTS samples of the GP-mean posterior; returns the reference's
    samples_dict schema (x / logp / best / method), plus ``warm_state``.

    ``warm_state`` (the previous call's return entry): reuse the adapted
    step size + mass matrix and continue from the previous chain ends, with
    a short fixed-mass step-size re-adaptation instead of the full windowed
    warmup — successive BO iterations move the surrogate posterior only
    slightly, and re-estimating the mass from scratch each iteration is the
    reference's single largest per-iteration MCMC cost. Guarded: if the warm
    run's acceptance collapses or divergences appear, it is discarded and a
    cold full-warmup run is done instead (bias can only enter through the
    initial state, which the guard + burn-in cover; the NUTS kernel itself
    is invariant for any mass)."""
    warmup_steps, num_samples, thinning = get_hmc_settings(
        ndim=gp.ndim, **{k: v for k, v in kwargs.items()
                         if k in ("warmup_steps", "num_samples", "thinning")})
    num_chains = _mesh_aligned_chains(int(num_chains))
    np_rng = np_rng if np_rng is not None else get_numpy_rng()
    key = rng_key if rng_key is not None else get_new_jax_key()

    clf, apply, ctx = _gated_apply_ctx(gp, temp)
    keys = jax.random.split(key, num_chains)
    # default_kind="nuts": legacy warm states predate the 'kind' field
    warm_ok = _warm_state_matches(warm_state, "nuts", num_chains, gp.ndim,
                                  dense_mass, temp, default_kind="nuts")
    if warm_ok and clf is not None and \
            _plateau_frac_ok(apply, ctx, warm_state, gp, temp) < 1.0:
        log.debug("warm NUTS rejected: a cached chain end now falls in "
                  "the classifier's infeasible region")
        warm_ok = False
    if warm_ok:
        rewarm = max(32, int(warmup_steps) // 4)
        runner = _nuts_runner(apply, rewarm, int(num_samples), int(thinning),
                              bool(dense_mass), int(max_tree_depth), warm=True)
        zs, logps, diag = runner(
            ctx, _maybe_shard_chains(jnp.asarray(warm_state["last_z"])),
            _maybe_shard_chains(keys), _warm_kernel_tuple(warm_state))
        accept = float(np.mean(np.asarray(diag["mean_accept"])))
        div_rate = float(np.sum(np.asarray(diag["n_divergent"]))) / max(
            1, num_chains * num_samples)
        if accept < 0.6 or div_rate > 0.05:
            log.debug(f"warm NUTS rejected (accept={accept:.2f}, "
                      f"div={div_rate:.3f}); falling back to cold warmup")
            warm_ok = False
    if not warm_ok:
        runner = _nuts_runner(apply, int(warmup_steps), int(num_samples),
                              int(thinning), bool(dense_mass), int(max_tree_depth))
        zs, logps, diag = runner(
            ctx, _maybe_shard_chains(_cold_logit_inits(gp, num_chains, np_rng)),
            _maybe_shard_chains(keys))

    out = _bundle_samples(gp, clf, ctx, zs, diag, "nuts", num_chains,
                          dense_mass, temp)
    log.debug(f"NUTS: mean accept={np.mean(out['diagnostics']['mean_accept']):.3f}, "
              f"divergences={int(np.sum(out['diagnostics']['n_divergent']))}")
    return out


# ------------------------------------------------------- ensemble HMC refresh

def get_ehmc_settings(ndim, num_chains=None, num_samples=None, warmup_steps=None):
    """(num_chains, kept_per_chain, cold_warmup) for the ensemble refresh.

    ``num_samples`` is the TOTAL pool size (matching get_hmc_settings'
    num_samples semantics after thinning across 4 NUTS chains)."""
    num_chains = int(num_chains) if num_chains else 64
    total = int(num_samples) if num_samples else (1024 if ndim <= 9 else 2048)
    kept = max(4, -(-total // num_chains))
    cold_warmup = int(warmup_steps) if warmup_steps else (128 if ndim <= 9 else 256)
    return num_chains, kept, cold_warmup


def sample_gp_ensemble(gp, np_rng=None, rng_key=None, num_chains: int = 64,
                       temp: float = 1.0, dense_mass: bool = True,
                       num_leapfrog: int = 16, warm_state: Optional[Dict] = None,
                       **kwargs) -> Dict:
    """MC-pool refresh via the lockstep chain ensemble (infer/ehmc.py).

    Same samples_dict schema as :func:`sample_gp_nuts`. This is the default
    per-iteration pool refresh: the reference refreshed with full NUTS
    (/root/reference/BOBE/bo.py:1314), whose sequential tree-building is the
    dominant small-problem latency on an accelerator; the ensemble advances
    64 persistent chains in lockstep so each leapfrog is one (64, d) batched
    GP-mean evaluation and steady-state refreshes reuse the adapted kernel
    AND the spread ensemble state (every surviving mode stays populated).
    NUTS remains the final-samples sampler.
    """
    nc, kept, cold_warmup = get_ehmc_settings(
        gp.ndim, num_chains=_mesh_aligned_chains(int(num_chains)),
        num_samples=kwargs.get("num_samples"),
        warmup_steps=kwargs.get("warmup_steps"))
    thinning = int(kwargs.get("thinning") or 2)
    np_rng = np_rng if np_rng is not None else get_numpy_rng()
    key = rng_key if rng_key is not None else get_new_jax_key()

    from .infer.ehmc import run_ensemble

    clf, apply, ctx = _gated_apply_ctx(gp, temp)
    warm_ok = _warm_state_matches(warm_state, "ehmc", nc, gp.ndim,
                                  dense_mass, temp)
    if warm_ok and clf is not None:
        # the lockstep ensemble tolerates a few stranded chains (they re-enter
        # during the short re-adaptation), hence the 0.9 fraction vs NUTS' all
        frac_ok = _plateau_frac_ok(apply, ctx, warm_state, gp, temp)
        if frac_ok < 0.9:
            log.debug(f"warm ensemble rejected: {1 - frac_ok:.0%} of chain "
                      "ends now infeasible under the retrained classifier")
            warm_ok = False
    if warm_ok:
        zs, logps, diag = run_ensemble(
            apply, ctx, _maybe_shard_chains(jnp.asarray(warm_state["last_z"])), key,
            num_warmup=24, num_samples=kept, thinning=thinning,
            dense_mass=bool(dense_mass), num_leapfrog=int(num_leapfrog),
            warm=_warm_kernel_tuple(warm_state), adapt_mass=False)
        accept = float(np.asarray(diag["mean_accept"]))
        div_rate = float(np.asarray(diag["n_divergent"])) / max(1, nc * kept * thinning)
        if accept < 0.5 or div_rate > 0.05:
            log.debug(f"warm ensemble rejected (accept={accept:.2f}, "
                      f"div={div_rate:.3f}); cold restart")
            warm_ok = False
    if not warm_ok:
        zs, logps, diag = run_ensemble(
            apply, ctx, _maybe_shard_chains(_cold_logit_inits(gp, nc, np_rng)),
            key, num_warmup=cold_warmup,
            num_samples=kept, thinning=thinning, dense_mass=bool(dense_mass),
            num_leapfrog=int(num_leapfrog))

    out = _bundle_samples(gp, clf, ctx, zs, diag, "ehmc", nc, dense_mass, temp)
    log.debug(f"EHMC: accept={float(out['diagnostics']['mean_accept']):.3f}, "
              f"divergences={int(out['diagnostics']['n_divergent'])}")
    return out
