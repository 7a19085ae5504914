"""Vectorized nested sampling, fully on device.

The reference runs dynesty's StaticNestedSampler with the GP mean as the
likelihood (/root/reference/BOBE/samplers.py:55-194). dynesty's random-walk
replacement loop is host-driven Python — every one of its 1e4-1e6 likelihood
calls crosses the host<->device boundary, which is THE dominant bottleneck of
the reference on accelerators (SURVEY.md section 3.2). This module replaces it
with a batched nested sampler whose entire run is ONE jitted while_loop:

* Batch kill: each outer step retires the K worst live points at once. The
  expected log-volume shrinkage of the r-th retired point is
  -sum_{m<=r} 1/(nlive - m) (order statistics of simultaneous kills), which
  reproduces dynesty's -1/nlive per point as K/nlive -> 0.
* Batch replace: K survivors are cloned and evolved by hit-and-run slice
  sampling constrained to logL > L* — directions are drawn from the live-point
  empirical covariance (whitened, like PolyChord), the initial bracket is the
  full unit-cube chord, and shrinkage iterates to acceptance. All K chains
  advance in lockstep, so every constrained-likelihood evaluation is a
  (K, d)-batched GP predict on the MXU.
* Stopping: remaining-evidence criterion dlogz (same semantics as dynesty),
  plus call/buffer budgets.

Evidence post-processing (trapezoid logZ, information, GP-sigma bounds) is in
infer/integrals.py and matches the reference's constructions exactly.
"""
from __future__ import annotations

import math
import os
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from ..utils.log import get_logger

log = get_logger("nested")


class NSResult(NamedTuple):
    dead_x: np.ndarray      # (n_total, d) dead + final live, sampling order
    dead_logl: np.ndarray   # (n_total,)
    logvol: np.ndarray      # (n_total,) assigned log prior volumes
    logz: float             # quick accumulated estimate (use integrals for final)
    n_calls: int
    n_iter: int
    nlive: int
    success: bool
    nlive_schedule: np.ndarray = None  # (n_total,) own live count per death
    #   (batch kills decay within a batch; final unwind decays to 1) — the
    #   input merge_runs needs for varying-live-count recombination
    logvol0: float = 0.0    # log prior volume the live set was seeded in
    #   (log of the feasible fraction for classifier-gated surrogates whose
    #   live points are rejection-seeded inside the feasible region; the
    #   evidence integrals must start their first volume shell here)


def _live_cov_chol(live_x):
    """Cholesky of the live-set empirical covariance (whitened sampling)."""
    nlive, d = live_x.shape
    mean = jnp.mean(live_x, axis=0)
    xc = (live_x - mean) / jnp.sqrt(jnp.asarray(nlive, live_x.dtype))
    cov = xc.T @ xc + 1e-10 * jnp.eye(d, dtype=live_x.dtype)
    return jnp.linalg.cholesky(cov)


def _slice_directions(key, live_x, n_dir):
    """Directions from the live-set empirical covariance (whitened sampling).

    live_x: (nlive, d); returns (n_dir, d) unnormalized direction vectors.
    """
    chol = _live_cov_chol(live_x)
    z = random.normal(key, (n_dir, live_x.shape[1]), dtype=live_x.dtype)
    return z @ chol.T


def _chord_bounds(x, e):
    """Intersection of the line x + t*e with the unit cube: (t_lo, t_hi)."""
    eps = 1e-30
    e_safe = jnp.where(jnp.abs(e) < eps, eps, e)
    t0 = (0.0 - x) / e_safe
    t1 = (1.0 - x) / e_safe
    lo = jnp.max(jnp.minimum(t0, t1))
    hi = jnp.min(jnp.maximum(t0, t1))
    return lo, hi


def _spec_candidates(u, lo, hi, spec):
    """Speculative shrink chain: the ``spec`` candidate positions a lane's
    slice loop would draw if every previous candidate were rejected.

    The bracket transition on rejection depends only on the SIGN of the
    rejected t (shrink toward 0), never on the likelihood value — so the
    whole chain t_1..t_S is computable from the uniforms up front, and all S
    candidates evaluate in ONE batched GP call instead of S sequential
    latency-priced loop iterations. u: (spec, n); lo/hi: (n,). Returns
    (ts (n, spec), lo_end, hi_end) where lo_end/hi_end is the bracket after
    all S speculative rejections.
    """
    ts = []
    for s in range(spec):
        t = lo + (hi - lo) * u[s]
        ts.append(t)
        lo = jnp.where(t < 0, t, lo)
        hi = jnp.where(t >= 0, t, hi)
    return jnp.stack(ts, axis=1), lo, hi


@partial(jax.jit, static_argnames=("loglike_apply", "nlive", "kill_k",
                                   "max_dead", "n_repeats", "max_shrink", "d",
                                   "mesh", "spec"))
def _ns_loop(loglike_apply: Callable, ctx, live_x0, live_logl0, key, logvol0,
             nlive: int, kill_k: int, max_dead: int, n_repeats: int,
             max_shrink: int, d: int, dlogz: float, maxcall: int, mesh=None,
             carry0=None, spec: int = 1):
    """The jitted NS main loop. Returns the full loop carry (see ``init``).

    ``loglike_apply(ctx, x)`` evaluates the batched log-likelihood; ``ctx`` is
    a traced pytree (e.g. the GP state) so successive BO iterations with new
    training data reuse the same compiled loop — no per-iteration retraces.

    ``maxcall`` is TRACED, and ``carry0`` (a previous invocation's return)
    resumes the loop exactly where it stopped — together they let the host
    run NS as a sequence of bounded device dispatches (run_nested's
    segmenting): the PRNG chain lives in the carry, so a segmented run is
    bit-identical to a single dispatch. Long single dispatches are what relay
    /tunneled-TPU transports kill (measured: d=30 convergence NS faulted the
    worker ~15 min into one dispatch).
    """
    loglike_fn = lambda x: loglike_apply(ctx, x)
    dt = live_x0.dtype
    K = kill_k

    # expected shrinkage for simultaneous kill of K worst among nlive
    hs = jnp.cumsum(1.0 / (nlive - jnp.arange(K, dtype=dt)))  # (K,)

    def replace_batch(key, live_x, live_logl, survivor_idx, lstar):
        """Evolve K clones of random survivors above lstar via slice sampling.

        survivor_idx: (nlive - K,) indices of genuine survivors — clones start
        uniformly over survivors (dynesty picks a random live point the same
        way for its walk starts).

        Fused per-lane loop: every lane runs its own n_repeats slice updates
        back-to-back — a lane that accepts draws a fresh direction and starts
        its next repeat on the very next iteration instead of idling until
        the slowest lane of the round accepts. Sequential batched-GP evals
        per outer step drop from sum_r max_lanes(shrink_r) to
        max_lanes(sum_r shrink_r): the max-over-lanes tail (~log K extra
        shrinks) is paid once rather than n_repeats times, which at
        n_repeats = 3d (d >= 10) is the dominant sequential depth of the
        whole sampler."""
        k_pick, k_dir, k_loop = random.split(key, 3)
        pick = random.randint(k_pick, (K,), 0, nlive - K)
        idx = survivor_idx[pick]
        x_cur = live_x[idx]
        l_cur = live_logl[idx]

        chol = _live_cov_chol(live_x)  # fixed within this outer step

        def draw_dirs(k):
            z = random.normal(k, (K, d), dtype=dt)
            return z @ chol.T

        e0 = draw_dirs(k_dir)
        lo0, hi0 = jax.vmap(_chord_bounds)(x_cur, e0)

        def body(c):
            it, nev, key, rep, shrink, e, lo, hi, x_cur, l_cur = c
            key, k_t, k_e = random.split(key, 3)
            active = rep < n_repeats
            # ``spec`` speculative shrink candidates per lane in ONE batched
            # GP call (see _spec_candidates): the sequential depth per accept
            # drops from E[shrinks-to-accept] loop iterations to ~1, and the
            # extra rows are ~free (the (K, cap) GP eval at these shapes is
            # latency-bound, not compute-bound — measured batch-insensitive
            # 64 vs 512 rows on the v5e).
            u = random.uniform(k_t, (spec, K), dtype=dt)
            ts, lo_end, hi_end = _spec_candidates(u, lo, hi, spec)
            x_try = jnp.clip(x_cur[:, None, :] + ts[..., None] * e[:, None, :],
                             0.0, 1.0).reshape(K * spec, d)
            if mesh is not None:
                # multi-chip: the proposal batch (the hot GP-mean eval)
                # is sharded over the mesh; the GP state is replicated
                from ..parallel.mesh import batch_sharded

                x_try = jax.lax.with_sharding_constraint(
                    x_try, batch_sharded(mesh))
            l_try = loglike_fn(x_try).reshape(K, spec)
            # candidate s is reachable by the sequential algorithm only while
            # the shrink budget lasts (draw s happens after s rejections)
            reachable = shrink[:, None] + jnp.arange(spec)[None, :] < max_shrink
            acc = (l_try > lstar) & reachable
            any_acc = jnp.any(acc, axis=1)
            first = jnp.argmax(acc, axis=1)
            ok = any_acc & active
            # exact eval accounting (dynesty-equivalent ncall semantics):
            # lanes logically consume draws up to acceptance, or all
            # reachable draws on full rejection — regardless of the fused
            # physical batch size
            n_reach = jnp.clip(max_shrink - shrink, 0, spec)
            used = jnp.where(any_acc, first + 1, n_reach)
            nev = nev + jnp.sum(jnp.where(active, used, 0)).astype(nev.dtype)
            x_acc = jnp.take_along_axis(x_try.reshape(K, spec, d),
                                        first[:, None, None], axis=1)[:, 0]
            l_acc = jnp.take_along_axis(l_try, first[:, None], axis=1)[:, 0]
            x_cur = jnp.where(ok[:, None], x_acc, x_cur)
            l_cur = jnp.where(ok, l_acc, l_cur)
            # full rejection: the bracket shrinks through all speculative
            # rejections (over-shrink past the budget is harmless — those
            # lanes complete below and reset their bracket)
            nok = active & ~any_acc
            lo = jnp.where(nok, lo_end, lo)
            hi = jnp.where(nok, hi_end, hi)
            shrink = jnp.where(nok, shrink + n_reach, shrink)
            # a repeat completes on acceptance or on exhausting max_shrink
            # (exhausted lanes keep their current point, as before)
            complete = ok | (nok & (shrink >= max_shrink))
            rep = rep + complete.astype(rep.dtype)
            # fresh direction + full-chord bracket for completed lanes
            e_new = draw_dirs(k_e)
            lo_new, hi_new = jax.vmap(_chord_bounds)(x_cur, e_new)
            e = jnp.where(complete[:, None], e_new, e)
            lo = jnp.where(complete, lo_new, lo)
            hi = jnp.where(complete, hi_new, hi)
            shrink = jnp.where(complete, 0, shrink)
            return it + 1, nev, key, rep, shrink, e, lo, hi, x_cur, l_cur

        def cond(c):
            it, _, _, rep, *_ = c
            # per-lane budget bounds total iterations; the it guard is a
            # backstop against pathological non-termination
            return jnp.any(rep < n_repeats) & (it < n_repeats * max_shrink)

        nev0 = jnp.asarray(0, jnp.int64)
        rep0 = jnp.zeros(K, jnp.int32)
        shrink0 = jnp.zeros(K, jnp.int32)
        out = lax.while_loop(cond, body,
                             (0, nev0, k_loop, rep0, shrink0, e0, lo0, hi0,
                              x_cur, l_cur))
        _, nev, _, _, _, _, _, _, x_new, l_new = out
        return x_new, l_new, nev

    def body(c):
        (it, key, live_x, live_logl, dead_x, dead_logl, dead_lv,
         n_dead, logvol, logz, calls) = c
        key, k_rep = random.split(key)

        order = jnp.argsort(live_logl)
        kill_idx = order[:K]
        lstar = live_logl[order[K - 1]]

        # record dead points with their assigned shrinking volumes
        lv_batch = logvol - hs  # (K,)
        dx = live_x[kill_idx]
        dl = live_logl[kill_idx]
        zero = jnp.zeros((), dtype=n_dead.dtype)
        dead_x = lax.dynamic_update_slice(dead_x, dx, (n_dead, zero))
        dead_logl = lax.dynamic_update_slice(dead_logl, dl, (n_dead,))
        dead_lv = lax.dynamic_update_slice(dead_lv, lv_batch, (n_dead,))

        # quick rectangle logz accumulation (stopping rule only)
        lv_prev = jnp.concatenate([logvol[None], lv_batch[:-1]])
        logdvol = lv_prev + jnp.log1p(-jnp.exp(jnp.minimum(lv_batch - lv_prev, -1e-12)))
        logz = jnp.logaddexp(logz, jax.scipy.special.logsumexp(dl + logdvol))

        # evolve replacements from random survivor clones
        survivor_idx = order[K:]
        x_new, l_new, rep_calls = replace_batch(k_rep, live_x, live_logl,
                                                survivor_idx, lstar)
        live_x = live_x.at[kill_idx].set(x_new)
        live_logl = live_logl.at[kill_idx].set(l_new)

        return (it + 1, key, live_x, live_logl, dead_x, dead_logl, dead_lv,
                n_dead + K, logvol - hs[-1], logz, calls + rep_calls)

    def cond(c):
        (it, key, live_x, live_logl, dead_x, dead_logl, dead_lv,
         n_dead, logvol, logz, calls) = c
        delta = jnp.logaddexp(logz, jnp.max(live_logl) + logvol) - logz
        room = n_dead + K <= max_dead
        return (delta > dlogz) & room & (calls < maxcall)

    if carry0 is None:
        neg = jnp.asarray(-1e300, dt)
        init = (
            jnp.asarray(0, jnp.int32), key, live_x0, live_logl0,
            jnp.zeros((max_dead, d), dt), jnp.full((max_dead,), neg),
            jnp.full((max_dead,), neg),
            jnp.asarray(0, jnp.int32), jnp.asarray(logvol0, dt), neg,
            jnp.asarray(0, jnp.int64),
        )
    else:
        init = carry0
    return lax.while_loop(cond, body, init)


def _resolve_spec(spec, d: int) -> int:
    """Speculative slice-shrink depth (see _spec_candidates): the sequential
    while_loop depth divides by ~E[shrinks-to-accept] while the batched GP
    eval grows K -> K*spec rows. Measured on the v5e (GP cap 1024,
    convergence mode): d=15 5.90 -> 4.18 s (spec 1 -> 4), d=8 1.19 -> 1.54 s
    — the win scales with the n_repeats = 3d sequential depth, so
    speculation turns on where that depth rule does (d >= 10). Override with
    BOBE_TPU_NS_SPEC; shared by run_nested and the dynamic-batch
    decorrelation stage so the env knob governs both (advisor round 4)."""
    if spec is None:
        env = os.environ.get("BOBE_TPU_NS_SPEC")
        spec = int(env) if env else (4 if d >= 10 else 1)
    return max(1, int(spec))


def run_nested(loglike_apply: Callable, ctx, d: int, key, nlive: int = 500,
               dlogz: float = 0.01, maxcall: int = int(5e6),
               kill_frac: float = 0.1, n_repeats: int | None = None,
               max_shrink: int = 40, max_dead: int | None = None,
               live_x=None, live_logl=None, rng=None,
               logvol0: float = 0.0, mesh=None,
               warn_truncation: bool = True, spec: int | None = None) -> NSResult:
    """Run nested sampling; ``loglike_apply(ctx, x)`` maps (m, d) -> (m,).

    ``loglike_apply`` must be a stable (cacheable) function and ``ctx`` the
    traced data it needs. live_x/live_logl optionally seed the live set
    (classifier-aware seeding happens in samplers.py, mirroring reference
    samplers.py:129-155).

    ``logvol0``: log prior volume the seeded live set actually covers. For
    classifier-gated surrogates the live points are rejection-seeded inside
    the feasible region (the minus_inf floor outside is a likelihood PLATEAU
    covering most of the prior); starting the shrinkage ledger at the log
    feasible fraction is the exact volume accounting for that restricted
    support — the role dynesty's plateau handling plays for the reference
    (without it logZ is biased up by -f - log(1-f), ~ +0.8 at f ~ 0.8).
    """
    dt = jnp.float64
    if live_x is None:
        rng = rng if rng is not None else np.random.default_rng()
        live_x = jnp.asarray(rng.uniform(size=(nlive, d)), dtype=dt)
    else:
        live_x = jnp.asarray(live_x, dtype=dt)
        nlive = live_x.shape[0]
    if live_logl is None:
        live_logl = loglike_apply(ctx, live_x)
    live_logl = jnp.asarray(live_logl, dtype=dt)

    K = max(1, int(round(nlive * kill_frac)))
    if n_repeats is None:
        n_repeats = max(3, int(math.ceil(1.5 * d)))
    spec = _resolve_spec(spec, d)
    if max_dead is None:
        # converged runs need ~nlive * (H + ln nlive) deaths; the nlive * 80
        # headroom covers H + ln nlive ~ 80, and the clamp must scale with
        # nlive or boosted final-precision runs (nlive up to 8x the base)
        # exhaust the buffer mid-compression (dead_x is max_dead * d f64:
        # ~184 MB at nlive=9600, d=30 — fine on TPU HBM and host RAM)
        max_dead = int(min(1_000_000, max(20_000, nlive * 80)))
    max_dead = ((max_dead + K - 1) // K) * K  # multiple of K

    # Segmented dispatch: run the jitted loop in bounded call-budget chunks
    # (maxcall is traced; the carry — including the PRNG key — round-trips
    # through each segment, so results are BIT-IDENTICAL to one dispatch).
    # Motivation: a single d=30 convergence NS dispatch runs for many minutes
    # and relay/tunneled-TPU transports kill long-running device calls
    # (measured worker faults ~15 min in). Each segment targets
    # BOBE_TPU_NS_SEGMENT_S seconds (default 60), sized adaptively from the
    # measured call rate; only a few scalars cross the host boundary between
    # segments. BOBE_TPU_NS_CHUNK_CALLS=0 disables segmenting.
    import os as _os
    import time as _time

    seg_target = float(_os.environ.get("BOBE_TPU_NS_SEGMENT_S", "60"))
    chunk_env = _os.environ.get("BOBE_TPU_NS_CHUNK_CALLS")
    fixed_chunk = int(chunk_env) if chunk_env is not None else None
    # small first segment to measure the call rate cheaply (~2% of a typical
    # converged run's 100*nlive*n_repeats budget). fixed_chunk == 0 disables
    # segmenting (budget = maxcall below -> one dispatch)
    chunk = fixed_chunk if fixed_chunk is not None else 2 * nlive * int(n_repeats)
    carry = None
    calls_done = 0
    while True:
        budget = maxcall if chunk <= 0 else min(int(maxcall),
                                                calls_done + int(chunk))
        t_seg = _time.time()
        carry = _ns_loop(
            loglike_apply, ctx, live_x, live_logl, key,
            jnp.asarray(float(logvol0), dt), nlive, K, max_dead,
            int(n_repeats), int(max_shrink), d, float(dlogz), int(budget),
            mesh, carry0=carry, spec=spec)
        # segment bookkeeping: a handful of scalars only; buffers stay on
        # device until the final bundled fetch below
        n_dead_d, logvol_d, logz_d, calls_d, lmax_d = jax.device_get(
            (carry[7], carry[8], carry[9], carry[10], jnp.max(carry[3])))
        dt_seg = max(_time.time() - t_seg, 1e-3)
        delta = np.logaddexp(logz_d, lmax_d + logvol_d) - logz_d
        done = (delta <= dlogz or int(n_dead_d) + K > max_dead
                or int(calls_d) >= maxcall)
        if done or budget >= maxcall:
            break
        if not fixed_chunk:
            rate = max((int(calls_d) - calls_done) / dt_seg, 1.0)
            chunk = max(int(rate * seg_target), nlive)
        calls_done = int(calls_d)
    (it_c, _key_c, live_x, live_logl, dead_x, dead_logl, dead_lv,
     n_dead, logvol, logz, calls) = carry
    n_iter = it_c

    # one bundled device->host transfer for all result buffers (serial
    # per-array fetches are latency-priced on tunneled TPUs)
    (dead_x, dead_logl, dead_lv, live_x, live_logl, n_dead, logvol,
     n_iter, calls) = jax.device_get(
        (dead_x, dead_logl, dead_lv, live_x, live_logl, n_dead, logvol,
         n_iter, calls))
    n_dead = int(n_dead)
    dead_x = np.asarray(dead_x)[:n_dead]
    dead_logl = np.asarray(dead_logl)[:n_dead]
    dead_lv = np.asarray(dead_lv)[:n_dead]
    logvol = float(logvol)

    # append the final live set: remaining volume split uniformly
    # X_i = X_end * (nlive - i)/nlive for the i-th in ascending logl
    live_order = np.argsort(np.asarray(live_logl))
    lx = np.asarray(live_x)[live_order]
    ll = np.asarray(live_logl)[live_order]
    frac = (nlive - np.arange(1, nlive + 1)) / nlive
    lv_live = logvol + np.log(np.clip(frac, 1e-300, None))

    all_x = np.concatenate([dead_x, lx])
    all_logl = np.concatenate([dead_logl, ll])
    all_lv = np.concatenate([dead_lv, lv_live])
    # own live-count schedule: within each kill batch the count decays
    # nlive, nlive-1, ..., nlive-K+1 (order statistics of simultaneous
    # kills), and the final unwind decays nlive..1
    sched_dead = np.tile(nlive - np.arange(K), n_dead // K)[:n_dead]
    sched_live = nlive - np.arange(nlive)
    schedule = np.concatenate([sched_dead, sched_live]).astype(float)

    if int(calls) >= maxcall and warn_truncation:
        # warn_truncation=False: deliberately budget-capped runs (e.g. the
        # compile prewarmer passes maxcall=64 to compile the production loop
        # graph without paying a full NS execution)
        log.warning(
            f"NS terminated on maxcall={maxcall} before reaching dlogz="
            f"{dlogz} (n_iter={int(n_iter)}); logZ is truncated low — raise "
            "maxcall (samplers.nested_sampling scales it automatically)")
    elif n_dead + K > max_dead and warn_truncation:
        # the dead-point buffer (a static while_loop shape) ran out — warn
        # only if the stopping rule had NOT fired (previously this was a
        # SILENT truncation path)
        delta_end = float(np.logaddexp(logz, np.max(np.asarray(live_logl))
                                       + logvol) - logz)
        if delta_end > dlogz:
            log.warning(
                f"NS terminated on the max_dead={max_dead} buffer before "
                f"reaching dlogz={dlogz} (n_iter={int(n_iter)}, remaining "
                f"delta={delta_end:.3g}); logZ is truncated low — pass a "
                "larger max_dead")
    success = bool(n_dead > 0 and not np.all(all_logl == all_logl[0]))
    return NSResult(all_x, all_logl, all_lv, float(logz), int(calls),
                    int(n_iter), nlive, success, schedule, float(logvol0))


@partial(jax.jit, static_argnames=("loglike_apply", "n_repeats", "max_shrink",
                                   "spec"))
def _decorrelate(loglike_apply, ctx, x0, l0, lstar, key,
                 n_repeats: int, max_shrink: int, spec: int = 4):
    """Constrained slice-sampling rounds on ALL points (uniformizes within
    {logl > lstar}). Used to turn volume-weighted resamples of existing dead
    points into fresh draws before a dynamic refinement batch — duplicated
    deaths would otherwise double-shrink the merged volume schedule."""
    n, d = x0.shape
    dt = x0.dtype
    loglike_fn = lambda x: loglike_apply(ctx, x)

    # fused per-lane loop (see _ns_loop.replace_batch): each lane runs its
    # n_repeats slice updates back-to-back instead of barriering per repeat.
    # Directions come from the evolving ensemble's covariance, refreshed each
    # time any lane completes a repeat (the ensemble is the best local
    # whitening available, as before).
    k_dir, k_loop = random.split(key)
    chol0 = _live_cov_chol(x0)

    def draw_dirs(k, chol):
        z = random.normal(k, (n, d), dtype=dt)
        return z @ chol.T

    e0 = draw_dirs(k_dir, chol0)
    lo0, hi0 = jax.vmap(_chord_bounds)(x0, e0)

    def body(c):
        it, nev, key, rep, shrink, e, lo, hi, x_cur, l_cur = c
        key, k_t, k_e = random.split(key, 3)
        active = rep < n_repeats
        # speculative shrink chain, same construction as _ns_loop's
        # replace_batch (see _spec_candidates)
        u = random.uniform(k_t, (spec, n), dtype=dt)
        ts, lo_end, hi_end = _spec_candidates(u, lo, hi, spec)
        x_try = jnp.clip(x_cur[:, None, :] + ts[..., None] * e[:, None, :],
                         0.0, 1.0).reshape(n * spec, d)
        l_try = loglike_fn(x_try).reshape(n, spec)
        reachable = shrink[:, None] + jnp.arange(spec)[None, :] < max_shrink
        acc = (l_try > lstar) & reachable
        any_acc = jnp.any(acc, axis=1)
        first = jnp.argmax(acc, axis=1)
        ok = any_acc & active
        n_reach = jnp.clip(max_shrink - shrink, 0, spec)
        used = jnp.where(any_acc, first + 1, n_reach)
        nev = nev + jnp.sum(jnp.where(active, used, 0)).astype(nev.dtype)
        x_acc = jnp.take_along_axis(x_try.reshape(n, spec, d),
                                    first[:, None, None], axis=1)[:, 0]
        l_acc = jnp.take_along_axis(l_try, first[:, None], axis=1)[:, 0]
        x_cur = jnp.where(ok[:, None], x_acc, x_cur)
        l_cur = jnp.where(ok, l_acc, l_cur)
        nok = active & ~any_acc
        lo = jnp.where(nok, lo_end, lo)
        hi = jnp.where(nok, hi_end, hi)
        shrink = jnp.where(nok, shrink + n_reach, shrink)
        complete = ok | (nok & (shrink >= max_shrink))
        rep = rep + complete.astype(rep.dtype)
        e_new = draw_dirs(k_e, _live_cov_chol(x_cur))
        lo_new, hi_new = jax.vmap(_chord_bounds)(x_cur, e_new)
        e = jnp.where(complete[:, None], e_new, e)
        lo = jnp.where(complete, lo_new, lo)
        hi = jnp.where(complete, hi_new, hi)
        shrink = jnp.where(complete, 0, shrink)
        return it + 1, nev, key, rep, shrink, e, lo, hi, x_cur, l_cur

    def cond(c):
        it, _, _, rep, *_ = c
        return jnp.any(rep < n_repeats) & (it < n_repeats * max_shrink)

    out = lax.while_loop(cond, body,
                         (0, jnp.asarray(0, jnp.int64), k_loop,
                          jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
                          e0, lo0, hi0, x0, l0))
    _, nev, _, _, _, _, _, _, x_new, l_new = out
    return x_new, l_new, nev


def merge_runs(runs, logvol0: float = 0.0):
    """Merge NS runs with dynesty's varying-live-count combine.

    ``logvol0``: log prior volume the merged runs' base live sets cover
    (log feasible fraction for rejection-seeded classifier-gated runs; the
    merged shrinkage ledger starts there).

    runs: list of (dead_x, dead_logl, nlive_schedule, logl_bound) where
    nlive_schedule[i] is the run's OWN live count at its i-th death (batch
    kills decay within a batch: nlive, nlive-1, ..., nlive-K+1; the final
    live unwind decays to 1 — run_nested returns this schedule), and
    logl_bound is -inf for a full run / the lower likelihood bound for a
    dynamic refinement batch (alive only above its bound). At the i-th merged
    death the combined live count is

        n_i = sum_r [L_i >= bound_r] * alive_r(L_i),

    alive_r(L) = r's schedule entry at its first death with logl >= L
    (nlive_r before its first death, 0 after its last), and volumes shrink as
    logvol_i = sum_{k<=i} log(n_k / (n_k + 1)) — dynesty's merge schedule,
    generalized to batch-kill runs.

    Returns (x, logl, logvol, n_at_death) sorted by ascending likelihood;
    ``n_at_death`` is the merged run's own live-count schedule, so a merged
    result can itself be merged again.
    """
    xs = np.concatenate([r[0] for r in runs], axis=0)
    logls = np.concatenate([r[1] for r in runs], axis=0)
    order = np.argsort(logls, kind="stable")
    xs, logls = xs[order], logls[order]

    n_at_death = np.zeros(logls.shape[0])
    for dead_x, dead_logl, schedule, bound in runs:
        o = np.argsort(dead_logl, kind="stable")
        sorted_l = dead_logl[o]
        sorted_n = np.asarray(schedule, dtype=float)[o]
        idx = np.searchsorted(sorted_l, logls, side="left")
        alive = np.where(idx < len(sorted_l), sorted_n[np.minimum(idx, len(sorted_l) - 1)], 0.0)
        alive = np.where(logls >= bound, alive, 0.0)
        n_at_death += alive
    n_at_death = np.maximum(n_at_death, 1.0)

    logvol = logvol0 + np.cumsum(np.log(n_at_death / (n_at_death + 1.0)))
    return xs, logls, logvol, n_at_death


def _batch_seed_probs(logvol, above, logvol0: float) -> np.ndarray:
    """Volume-shell weights for seeding a dynamic refinement batch from the
    base run's above-bound dead points.

    The first above-bound point's shell starts at the CROSSING volume — the
    ledger value of the last excluded (below-bound) death, `min` over the
    decreasing excluded prefix — falling back to the run's initial volume
    ``logvol0`` when nothing is excluded. (A previous version used
    ``np.max(logvol[~above], initial=0.0)``, which always returned the
    initial since every ledger entry is negative: the boundary point's shell
    then swallowed the whole prior volume and ~all batch seeds were copies
    of that single point, leaving batch independence entirely to the
    decorrelation pass.)
    """
    lv = logvol[above]
    crossing = float(np.min(logvol[~above], initial=logvol0))
    lv_prev = np.concatenate([[crossing], lv[:-1]])
    dvol = np.exp(lv_prev) - np.exp(lv)
    dvol = np.clip(dvol, 1e-300, None)
    return dvol / dvol.sum()


def run_nested_dynamic(loglike_apply, ctx, d: int, key, nlive: int = 500,
                       dlogz: float = 0.01, maxcall: int = int(5e6),
                       batch_frac: float = 1.0, wt_threshold: float = 0.01,
                       live_x=None, live_logl=None, rng=None,
                       logvol0: float = 0.0, **ns_kwargs) -> NSResult:
    """Dynamic nested sampling: base pass + posterior-bulk refinement batch.

    Mirrors dynesty's DynamicNestedSampler as used by the reference's final
    NS (/root/reference/BOBE/bo.py:1346-1367): after a static base run, a
    second live population of ``batch_frac * nlive`` points is devoted to the
    likelihood range carrying posterior weight above ``wt_threshold`` of the
    peak, and the two runs are combined with the varying-live-count volume
    schedule (:func:`merge_runs`). Posterior-bulk dead density roughly
    doubles at ~half the cost of doubling nlive globally.
    """
    rng = rng if rng is not None else np.random.default_rng()
    k_base, k_batch = random.split(key)
    base = run_nested(loglike_apply, ctx, d, k_base, nlive=nlive, dlogz=dlogz,
                      maxcall=maxcall, live_x=live_x, live_logl=live_logl,
                      rng=rng, logvol0=logvol0, **ns_kwargs)
    if not base.success:
        return base

    # posterior-bulk lower bound: first dead point whose importance weight
    # exceeds wt_threshold * max (dynesty's default weight function targets
    # the same region)
    from . import integrals

    logwt = integrals.logwt_from(base.dead_logl, base.logvol,
                                 lv_start=base.logvol0)
    keep = logwt >= logwt.max() + np.log(wt_threshold)
    l_lo = float(base.dead_logl[np.argmax(keep)])  # first True in logl order

    # seed the batch uniformly-in-volume above l_lo: resample base points
    # above the bound weighted by their volume shells, then let the slice
    # sampler decorrelate them during the batch run
    nlive_batch = max(8, int(round(batch_frac * nlive)))
    above = base.dead_logl > l_lo
    if above.sum() < 2:
        return base
    p = _batch_seed_probs(base.logvol, above, base.logvol0)
    pick = rng.choice(np.sum(above), size=nlive_batch, replace=True, p=p)
    bx = jnp.asarray(base.dead_x[above][pick])
    bl = jnp.asarray(base.dead_logl[above][pick])
    # decorrelate the resampled seeds within {logl > l_lo}: without this the
    # batch's early deaths are literal copies of base deaths and the merged
    # volume schedule double-shrinks (measured -0.5 logZ bias on a d=4 toy)
    k_batch, k_dec = random.split(k_batch)
    # decorrelation depth must match the runs' slice depth: samplers.py
    # raises n_repeats to 3d for d >= 10 (1.5d leaves clones correlated —
    # measured +0.24 logZ bias at d=15), and the batch seeds are exact
    # duplicates of base deaths, the worst case for residual correlation
    n_rep = ns_kwargs.get("n_repeats") or max(3, int(math.ceil(1.5 * d)))
    bx, bl, dec_calls = _decorrelate(loglike_apply, ctx, bx, bl,
                                     jnp.asarray(l_lo), k_dec, int(n_rep), 40,
                                     spec=_resolve_spec(ns_kwargs.get("spec"), d))

    batch = run_nested(loglike_apply, ctx, d, k_batch, nlive=nlive_batch,
                       dlogz=dlogz, maxcall=maxcall, live_x=bx, live_logl=bl,
                       rng=rng, **ns_kwargs)

    xs, logls, logvol, sched = merge_runs([
        (base.dead_x, base.dead_logl, base.nlive_schedule, -np.inf),
        (batch.dead_x, batch.dead_logl, batch.nlive_schedule, l_lo),
    ], logvol0=logvol0)
    logwt_m = integrals.logwt_from(logls, logvol, lv_start=logvol0)
    from scipy.special import logsumexp
    logz = float(logsumexp(logwt_m))
    return NSResult(xs, logls, logvol, logz,
                    base.n_calls + batch.n_calls + int(dec_calls),
                    base.n_iter + batch.n_iter,
                    base.nlive + batch.nlive,
                    bool(base.success and batch.success), sched,
                    float(logvol0))
