"""Ensemble jittered-HMC: many short chains in lockstep, batched on the MXU.

Why this exists: NUTS (infer/nuts.py) is the right tool for *final* posterior
samples, but its cost on an accelerator is SEQUENTIAL DEPTH — a 4-chain,
512-sample refresh at d=2 is ~30k dependent leapfrog steps, each a tiny
dispatch that leaves the MXU idle (the measured ~6-9 s/refresh of round 2;
NOTES_ROUND2 lead #4). The BO loop's MC-pool refresh (reference bo.py:1314 →
sample_GP_NUTS, /root/reference/BOBE/samplers.py:216) does not need NUTS'
per-chain adaptivity — it needs ~10^3 approximately-posterior points, fast.

The TPU-native shape for that job inverts the axes: MANY chains (default 64)
advanced in lockstep with FIXED-length jittered trajectories:

* every leapfrog evaluates the GP mean at a (C, d) batch — C-fold MXU work
  per dispatch instead of 1 point per chain per dispatch;
* trajectory length is drawn per-transition (shared across chains, so the
  compiled program is a single ``fori_loop``) — the standard jittered-HMC
  guard against resonant periodic orbits (Neal 2011 §5.3; the same idea
  ChEES-HMC [Hoffman et al. 2021, arXiv:2110.11576] builds on);
* adaptation pools statistics ACROSS chains: one shared step size adapted by
  dual averaging on the cross-chain mean acceptance, one shared mass matrix
  from the cross-chain sample covariance — C points of information per
  transition, so ~128 warmup transitions replace NUTS' 512;
* the chain ensemble persists across BO iterations (``warm``): the previous
  refresh's end states seed the next one, so steady-state refreshes pay only
  a short step-size re-adaptation. An ensemble spread over the posterior also
  keeps every mode of a multimodal surrogate populated — 4 sequential NUTS
  chains can lose modes that 64 persistent chains keep.

Each transition is a per-chain Metropolis-adjusted HMC step, so the kernel is
exactly invariant for the target regardless of the (frozen) eps/mass — the
adaptation trades only efficiency, not correctness.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, random

from .nuts import (
    MassMatrix,
    _da_init,
    _da_update,
    _find_reasonable_eps,
    _kinetic,
    _mass_from_cov,
    _sample_momentum,
    _warmup_schedule,
)


def _ensemble_transition(vg, key, z, logp, grad, eps, n_leap, mass, dense):
    """One jittered-HMC transition for all C chains in lockstep.

    n_leap is a traced scalar (shared across chains) so the unrolled program
    stays a single fori_loop. Returns (z, logp, grad, accept_prob (C,),
    diverged (C,))."""
    C, d = z.shape
    k_mom, k_acc = random.split(key)
    p0 = jax.vmap(lambda k: _sample_momentum(k, mass, dense, d))(
        random.split(k_mom, C))
    kin = jax.vmap(lambda p: _kinetic(p, mass, dense))
    H0 = -logp + kin(p0)

    def body(_, c):
        z, p, logp, grad = c
        # one fused (C, d) leapfrog: the GP-mean batch is the MXU payload
        p_half = p + 0.5 * eps * grad
        z_new = z + eps * jax.vmap(lambda ph: mass.inv @ ph if dense
                                   else mass.inv * ph)(p_half)
        logp_new, grad_new = vg(z_new)
        p_new = p_half + 0.5 * eps * grad_new
        return z_new, p_new, logp_new, grad_new

    z1, p1, logp1, grad1 = lax.fori_loop(0, n_leap, body, (z, p0, logp, grad))
    H1 = -logp1 + kin(p1)
    delta = H0 - H1  # log accept ratio per chain
    # NaN-safe: a NaN/huge-energy trajectory must reject (NaN < x is False)
    diverged = ~(delta > -1000.0)
    accept_prob = jnp.where(diverged, 0.0, jnp.exp(jnp.minimum(delta, 0.0)))
    log_u = jnp.log(random.uniform(k_acc, (C,), dtype=z.dtype))
    acc = (log_u < delta) & ~diverged
    z = jnp.where(acc[:, None], z1, z)
    logp = jnp.where(acc, logp1, logp)
    grad = jnp.where(acc[:, None], grad1, grad)
    return z, logp, grad, accept_prob, diverged


@partial(jax.jit, static_argnames=("logprob_apply", "num_warmup",
                                   "num_samples", "thinning", "dense_mass",
                                   "num_leapfrog", "adapt_mass"))
def run_ensemble(logprob_apply, ctx, init_z, key, num_warmup=128,
                 num_samples=8, thinning=2, dense_mass=True, num_leapfrog=16,
                 warm=None, adapt_mass=True):
    """Warmup + sampling for a C-chain lockstep ensemble.

    init_z: (C, d) chain starts. Returns (zs (num_samples, C, d),
    logps (num_samples, C), diag). ``warm=(eps, mass_inv, mass_chol)`` with
    ``adapt_mass=False`` freezes the mass matrix and only re-adapts the step
    size over the (short) ``num_warmup`` — the steady-state BO refresh path.
    """
    C, d = init_z.shape
    dt = init_z.dtype
    vg1 = jax.value_and_grad(lambda z: logprob_apply(ctx, z))
    vg = jax.vmap(vg1)

    k_eps, k_warm, k_run = random.split(key, 3)
    logp0, grad0 = vg(init_z)
    if warm is not None and not adapt_mass:
        eps_w, mass_inv, mass_chol = warm
        mass = MassMatrix(mass_inv, mass_chol)
        eps0 = jnp.clip(eps_w, 1e-6, 1e3)
    else:
        mass = (MassMatrix(jnp.eye(d, dtype=dt), jnp.eye(d, dtype=dt))
                if dense_mass else
                MassMatrix(jnp.ones(d, dt), jnp.ones(d, dt)))
        # anchor the doubling search at the best-logp init: the cross-chain
        # MEAN can sit on a classifier-gated plateau (or between modes) where
        # the gradient vanishes and the search would double eps to the clip
        eps0 = _find_reasonable_eps(vg1, init_z[jnp.argmax(logp0)], k_eps,
                                    mass, dense_mass)
    da = _da_init(eps0)
    is_mass_update = (_warmup_schedule(num_warmup) if adapt_mass
                      else jnp.zeros(num_warmup, bool))

    # cross-chain+window moment accumulators (cov = S2/n - mean mean^T; the
    # C-points-per-step stream makes Welford unnecessary)
    def _mom0():
        return (jnp.zeros((d,), dt),
                jnp.zeros((d, d) if dense_mass else (d,), dt),
                jnp.zeros((), dt))

    def warm_step(carry, upd_mass):
        z, logp, grad, da, mass, (s1, s2, n), key = carry
        k_leap, k_step, key = random.split(key, 3)
        n_leap = random.randint(k_leap, (), 1, num_leapfrog + 1)
        eps = jnp.exp(da.log_eps)
        z, logp, grad, acc_p, _ = _ensemble_transition(
            vg, k_step, z, logp, grad, eps, n_leap, mass, dense_mass)
        da = _da_update(da, jnp.mean(acc_p))
        s1 = s1 + jnp.sum(z, axis=0)
        s2 = s2 + (z.T @ z if dense_mass else jnp.sum(z * z, axis=0))
        n = n + C

        def apply_mass(args):
            da, mass, (s1, s2, n) = args
            mean = s1 / n
            cov = (s2 / n - (jnp.outer(mean, mean) if dense_mass
                             else mean * mean))
            mass = _mass_from_cov(cov, dense_mass, n)
            return _da_init(jnp.exp(da.log_eps_avg)), mass, _mom0()

        da, mass, (s1, s2, n) = lax.cond(
            upd_mass, apply_mass, lambda a: a, (da, mass, (s1, s2, n)))
        return (z, logp, grad, da, mass, (s1, s2, n), key), None

    (z, logp, grad, da, mass, _, _), _ = lax.scan(
        warm_step, (init_z, logp0, grad0, da, mass, _mom0(), k_warm),
        is_mass_update)
    eps_final = jnp.exp(da.log_eps_avg)

    def sample_step(carry, _):
        z, logp, grad, key = carry
        k_leap, k_step, key = random.split(key, 3)
        n_leap = random.randint(k_leap, (), 1, num_leapfrog + 1)
        z, logp, grad, acc_p, div = _ensemble_transition(
            vg, k_step, z, logp, grad, eps_final, n_leap, mass, dense_mass)
        return (z, logp, grad, key), (z, logp, acc_p, div)

    (z_end, _, _, _), (zs, logps, acc_ps, divs) = lax.scan(
        sample_step, (z, logp, grad, k_run), None,
        length=num_samples * thinning)
    zs = zs[thinning - 1::thinning]
    logps = logps[thinning - 1::thinning]
    diag = {"mean_accept": jnp.mean(acc_ps), "n_divergent": jnp.sum(divs),
            "step_size": eps_final,
            "mass_inv": mass.inv, "mass_chol": mass.chol_mass,
            "last_z": z_end}
    return zs, logps, diag
