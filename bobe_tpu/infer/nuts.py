"""Pure-JAX No-U-Turn Sampler, vectorized over chains.

The reference samples the GP surrogate with NumPyro's NUTS, dispatching chains
via pmap over (possibly faked) devices (/root/reference/BOBE/samplers.py:216-349).
numpyro is not a dependency here; this module implements multinomial NUTS
(Betancourt 2017, arXiv:1701.02434; progressive biased sampling and the
iterative U-turn-checkpoint scheme of the Stan/numpyro lineage) from scratch
with TPU-friendly structure:

* ONE leapfrog call site inside a ``lax.while_loop`` (no unrolled tree
  recursion), so the compiled program is small and the GP-mean evaluation
  inside it stays a single fused kernel.
* Chains are vmapped lanes — on one TPU chip this batches every GP predict
  across chains onto the MXU (instead of the reference's per-device pmap).
* Warmup follows Stan's windowed scheme: dual-averaging step size adaptation
  (target accept 0.8) plus Welford (co)variance estimation in doubling
  windows for a diagonal or dense mass matrix.

Supports target densities on R^d; the samplers module wraps the unit-cube
posterior with a logit reparametrization.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

MAX_DELTA_ENERGY = 1000.0


# ---------------------------------------------------------------- mass matrix

class MassMatrix(NamedTuple):
    """Either diagonal (inv_diag) or dense (inv_dense + chol of mass)."""

    inv: jax.Array        # (d,) or (d, d) inverse mass
    chol_mass: jax.Array  # (d,) sqrt or (d, d) lower chol of the MASS matrix


def _mass_from_cov(cov, dense: bool, reg_n) -> MassMatrix:
    """Regularized mass-matrix estimate from a sample covariance (Stan's
    shrinkage: cov * n/(n+5) + 1e-3 * 5/(n+5) * I)."""
    n = reg_n
    shrink = n / (n + 5.0)
    if dense:
        d = cov.shape[0]
        reg = cov * shrink + 1e-3 * (1.0 - shrink) * jnp.eye(d, dtype=cov.dtype)
        inv_mass = reg  # inverse mass = covariance estimate
        # mass = reg^-1; chol(mass) via chol of inverse:  mass = Li^T Li with
        # Li = inv(chol(reg)).  Sampling p ~ N(0, mass) uses p = Li^T eps.
        L = jnp.linalg.cholesky(reg)
        Li = jax.scipy.linalg.solve_triangular(L, jnp.eye(d, dtype=cov.dtype), lower=True)
        return MassMatrix(inv=inv_mass, chol_mass=Li)  # note: stores inv-chol
    else:
        var = cov * shrink + 1e-3 * (1.0 - shrink)
        return MassMatrix(inv=var, chol_mass=1.0 / jnp.sqrt(var))


def _sample_momentum(key, mass: MassMatrix, dense: bool, d):
    eps = random.normal(key, (d,), dtype=mass.inv.dtype)
    if dense:
        # chol_mass holds Li = inv(chol(inv_mass)); p = Li^T @ eps has
        # covariance Li^T Li = inv(inv_mass) = mass.
        return mass.chol_mass.T @ eps
    return mass.chol_mass * eps


def _psharp(p, mass: MassMatrix, dense: bool):
    if dense:
        return mass.inv @ p
    return mass.inv * p


def _kinetic(p, mass: MassMatrix, dense: bool):
    return 0.5 * jnp.dot(p, _psharp(p, mass, dense))


# ------------------------------------------------------------------- leapfrog

def _leapfrog(vg: Callable, z, p, grad, eps, mass: MassMatrix, dense: bool):
    p_half = p + 0.5 * eps * grad
    z_new = z + eps * _psharp(p_half, mass, dense)
    logp_new, grad_new = vg(z_new)
    p_new = p_half + 0.5 * eps * grad_new
    return z_new, p_new, logp_new, grad_new


def _is_turning(psharp_l, psharp_r, rho):
    return jnp.logical_or(jnp.dot(psharp_l, rho) <= 0.0, jnp.dot(psharp_r, rho) <= 0.0)


# --------------------------------------------------------------- tree building

class _TreeState(NamedTuple):
    z_prop: jax.Array
    logp_prop: jax.Array
    grad_prop: jax.Array
    lw: jax.Array            # logsumexp of leaf weights
    z_last: jax.Array        # far endpoint (the merged tree keeps its old
    p_last: jax.Array        # near endpoint, so only the far one is tracked)
    grad_last: jax.Array
    logp_last: jax.Array
    rho: jax.Array           # sum of momenta over leaves
    turning: jax.Array
    diverging: jax.Array
    sum_accept: jax.Array
    n_leaves: jax.Array


def _build_subtree(vg, key, depth_limit, n_steps, z0, p0, grad0, logp0,
                   eps_signed, mass, dense, H0):
    """Build a subtree of ``n_steps`` leapfrog leaves starting beyond
    (z0, p0). Iterative U-turn checks use the power-of-two checkpoint arrays
    (one (depth+1, d) buffer for momenta, one for prefix momentum sums)."""
    d = z0.shape[0]
    dt = z0.dtype
    D = depth_limit + 1

    def body(carry):
        (i, key, z, p, grad, logp, tree, p_ck, r_ck, rho_prefix) = carry
        key, k_acc = random.split(key)
        m = i  # leaf index in [0, n_steps)
        levels = 2 ** jnp.arange(1, D + 1)

        z_new, p_new, logp_new, grad_new = _leapfrog(vg, z, p, grad,
                                                     eps_signed, mass, dense)

        # store checkpoints where leaf m is the LEFT boundary of an aligned
        # subtree: its endpoint momentum is p_new (leaf m's own momentum) and
        # the prefix sum excludes it
        is_boundary = (m % levels) == 0  # (D,) level j boundary
        p_ck = jnp.where(is_boundary[:, None], p_new[None, :], p_ck)
        r_ck = jnp.where(is_boundary[:, None], rho_prefix[None, :], r_ck)
        energy_new = -logp_new + _kinetic(p_new, mass, dense)
        delta = energy_new - H0
        # NaN-safe: a NaN energy must count as a divergence (NaN > x is False)
        diverging = ~(delta <= MAX_DELTA_ENERGY)
        lw_leaf = jnp.where(diverging, -jnp.inf, -delta)
        accept_leaf = jnp.where(diverging, 0.0,
                                jnp.minimum(1.0, jnp.exp(-delta)))

        rho_prefix_new = rho_prefix + p_new

        # within-subtree U-turn checks for every aligned subtree ending here
        ends_here = ((m + 1) % levels) == 0  # (D,)
        rho_sub = rho_prefix_new[None, :] - r_ck  # (D, d)
        psharp_new = _psharp(p_new, mass, dense)
        psharp_ck = jax.vmap(lambda pc: _psharp(pc, mass, dense))(p_ck)
        turn_l = jnp.einsum("jd,jd->j", psharp_ck, rho_sub) <= 0.0
        turn_r = (rho_sub @ psharp_new) <= 0.0
        turning_now = jnp.any(ends_here & (turn_l | turn_r))

        # progressive multinomial proposal within the subtree
        lw_tot = jnp.logaddexp(tree.lw, lw_leaf)
        take = jnp.log(random.uniform(k_acc, dtype=dt)) < (lw_leaf - lw_tot)
        tree = tree._replace(
            z_prop=jnp.where(take, z_new, tree.z_prop),
            logp_prop=jnp.where(take, logp_new, tree.logp_prop),
            grad_prop=jnp.where(take, grad_new, tree.grad_prop),
            lw=lw_tot,
            z_last=z_new, p_last=p_new, grad_last=grad_new, logp_last=logp_new,
            rho=tree.rho + p_new,
            turning=tree.turning | turning_now,
            diverging=tree.diverging | diverging,
            sum_accept=tree.sum_accept + accept_leaf,
            n_leaves=tree.n_leaves + 1,
        )
        return (i + 1, key, z_new, p_new, grad_new, logp_new, tree,
                p_ck, r_ck, rho_prefix_new)

    def cond(carry):
        i, _, _, _, _, _, tree, _, _, _ = carry
        return (i < n_steps) & ~tree.turning & ~tree.diverging

    neg_inf = jnp.asarray(-jnp.inf, dtype=dt)
    tree0 = _TreeState(
        z_prop=z0, logp_prop=logp0, grad_prop=grad0, lw=neg_inf,
        z_last=z0, p_last=p0, grad_last=grad0,
        logp_last=logp0, rho=jnp.zeros(d, dt),
        turning=jnp.asarray(False), diverging=jnp.asarray(False),
        sum_accept=jnp.asarray(0.0, dt), n_leaves=jnp.asarray(0, jnp.int32),
    )
    p_ck0 = jnp.zeros((D, d), dt)
    r_ck0 = jnp.zeros((D, d), dt)
    carry = (jnp.asarray(0, jnp.int32), key, z0, p0, grad0, logp0, tree0,
             p_ck0, r_ck0, jnp.zeros(d, dt))
    carry = lax.while_loop(cond, body, carry)
    # the merged tree keeps its OLD near endpoint; the caller only needs the
    # subtree's far endpoint (z_last/p_last) and its momentum sum rho
    return carry[6]


class NutsCarry(NamedTuple):
    z: jax.Array
    logp: jax.Array
    grad: jax.Array


def nuts_step(vg, key, state: NutsCarry, eps, mass: MassMatrix, dense: bool,
              max_depth: int):
    """One NUTS transition. Returns (new_state, accept_stat, diverging)."""
    d = state.z.shape[0]
    dt = state.z.dtype
    k_mom, k_tree = random.split(key)
    p0 = _sample_momentum(k_mom, mass, dense, d)
    H0 = -state.logp + _kinetic(p0, mass, dense)

    neg_inf = jnp.asarray(-jnp.inf, dtype=dt)

    init = dict(
        key=k_tree,
        depth=jnp.asarray(0, jnp.int32),
        z_prop=state.z, logp_prop=state.logp, grad_prop=state.grad,
        lw=jnp.asarray(0.0, dt),  # weight of the initial point: exp(-(H0-H0))=1
        z_minus=state.z, p_minus=p0, grad_minus=state.grad, logp_minus=state.logp,
        z_plus=state.z, p_plus=p0, grad_plus=state.grad, logp_plus=state.logp,
        rho=p0,
        turning=jnp.asarray(False), diverging=jnp.asarray(False),
        sum_accept=jnp.asarray(0.0, dt), n_leaves=jnp.asarray(0, jnp.int32),
    )

    def cond(c):
        return (c["depth"] < max_depth) & ~c["turning"] & ~c["diverging"]

    def body(c):
        key, k_dir, k_sub, k_swap = random.split(c["key"], 4)
        go_right = random.bernoulli(k_dir)
        n_steps = 2 ** c["depth"]

        z0 = jnp.where(go_right, c["z_plus"], c["z_minus"])
        p0_ = jnp.where(go_right, c["p_plus"], c["p_minus"])
        g0 = jnp.where(go_right, c["grad_plus"], c["grad_minus"])
        lp0 = jnp.where(go_right, c["logp_plus"], c["logp_minus"])
        eps_signed = jnp.where(go_right, eps, -eps)

        sub = _build_subtree(vg, k_sub, max_depth, n_steps, z0, p0_, g0, lp0,
                             eps_signed, mass, dense, H0)

        # biased progressive sampling across the doubling
        take = jnp.log(random.uniform(k_swap, dtype=dt)) < (sub.lw - c["lw"])
        take = take & ~sub.turning & ~sub.diverging
        z_prop = jnp.where(take, sub.z_prop, c["z_prop"])
        logp_prop = jnp.where(take, sub.logp_prop, c["logp_prop"])
        grad_prop = jnp.where(take, sub.grad_prop, c["grad_prop"])

        ok = ~sub.turning & ~sub.diverging
        lw = jnp.where(ok, jnp.logaddexp(c["lw"], sub.lw), c["lw"])
        rho = c["rho"] + sub.rho

        z_plus = jnp.where(go_right, sub.z_last, c["z_plus"])
        p_plus = jnp.where(go_right, sub.p_last, c["p_plus"])
        g_plus = jnp.where(go_right, sub.grad_last, c["grad_plus"])
        lp_plus = jnp.where(go_right, sub.logp_last, c["logp_plus"])
        z_minus = jnp.where(go_right, c["z_minus"], sub.z_last)
        p_minus = jnp.where(go_right, c["p_minus"], sub.p_last)
        g_minus = jnp.where(go_right, c["grad_minus"], sub.grad_last)
        lp_minus = jnp.where(go_right, c["logp_minus"], sub.logp_last)

        turning_full = _is_turning(_psharp(p_minus, mass, dense),
                                   _psharp(p_plus, mass, dense), rho)
        return dict(
            key=key, depth=c["depth"] + 1,
            z_prop=z_prop, logp_prop=logp_prop, grad_prop=grad_prop, lw=lw,
            z_minus=z_minus, p_minus=p_minus, grad_minus=g_minus, logp_minus=lp_minus,
            z_plus=z_plus, p_plus=p_plus, grad_plus=g_plus, logp_plus=lp_plus,
            rho=rho,
            turning=c["turning"] | sub.turning | turning_full,
            diverging=c["diverging"] | sub.diverging,
            sum_accept=c["sum_accept"] + sub.sum_accept,
            n_leaves=c["n_leaves"] + sub.n_leaves,
        )

    out = lax.while_loop(cond, body, init)
    accept_stat = out["sum_accept"] / jnp.maximum(out["n_leaves"], 1)
    new_state = NutsCarry(out["z_prop"], out["logp_prop"], out["grad_prop"])
    return new_state, accept_stat, out["diverging"]


# ----------------------------------------------------------------- adaptation

class DualAveraging(NamedTuple):
    log_eps: jax.Array
    log_eps_avg: jax.Array
    h_avg: jax.Array
    mu: jax.Array
    t: jax.Array


def _da_init(eps0):
    # log_eps_avg starts at log(eps0), NOT 0: with zero adaptation steps the
    # final step size must be eps0 itself (exp(0)=1.0 would silently discard
    # a warm-started eps when num_warmup=0). The first _da_update fully
    # overwrites the average (w = t^-kappa = 1 at t=1), so warmup>=1 behavior
    # is unchanged.
    log_eps = jnp.log(eps0)
    return DualAveraging(log_eps, log_eps, jnp.zeros_like(log_eps),
                         jnp.log(10.0) + log_eps, jnp.zeros_like(log_eps))


def _da_update(da: DualAveraging, accept_stat, target=0.8,
               gamma=0.05, t0=10.0, kappa=0.75):
    t = da.t + 1.0
    h_avg = (1.0 - 1.0 / (t + t0)) * da.h_avg + (target - accept_stat) / (t + t0)
    log_eps = da.mu - jnp.sqrt(t) / gamma * h_avg
    w = t ** (-kappa)
    log_eps_avg = w * log_eps + (1.0 - w) * da.log_eps_avg
    return DualAveraging(log_eps, log_eps_avg, h_avg, da.mu, t)


class Welford(NamedTuple):
    n: jax.Array
    mean: jax.Array
    m2: jax.Array  # (d,) or (d, d)


def _welford_init(d, dense, dt):
    shape = (d, d) if dense else (d,)
    return Welford(jnp.zeros((), dt), jnp.zeros((d,), dt), jnp.zeros(shape, dt))


def _welford_update(w: Welford, x, dense):
    n = w.n + 1.0
    delta = x - w.mean
    mean = w.mean + delta / n
    delta2 = x - mean
    m2 = w.m2 + (jnp.outer(delta, delta2) if dense else delta * delta2)
    return Welford(n, mean, m2)


def _welford_cov(w: Welford):
    return w.m2 / jnp.maximum(w.n - 1.0, 1.0)


def _warmup_schedule(num_warmup: int):
    """Stan-style three-phase schedule; returns (is_mass_update, use_avg_eps)
    boolean arrays of length num_warmup. Mass updates happen at the ends of
    doubling 'slow' windows."""
    import numpy as np

    init_buffer, term_buffer, base_window = 75, 50, 25
    if num_warmup < init_buffer + term_buffer + base_window:
        init_buffer = max(1, int(0.15 * num_warmup))
        term_buffer = max(1, int(0.1 * num_warmup))
        base_window = max(1, num_warmup - init_buffer - term_buffer)
    is_mass = np.zeros(num_warmup, dtype=bool)
    start = init_buffer
    w = base_window
    while start + w < num_warmup - term_buffer:
        is_mass[start + w - 1] = True
        start += w
        w *= 2
    is_mass[max(0, num_warmup - term_buffer - 1)] = True
    return jnp.asarray(is_mass)


# ------------------------------------------------------------------ top level

def _find_reasonable_eps(vg, z, key, mass, dense):
    """Heuristic initial step size: double/halve until accept prob crosses 0.5
    (Hoffman & Gelman Algorithm 4)."""
    dt = z.dtype
    logp, grad = vg(z)
    p = _sample_momentum(key, mass, dense, z.shape[0])
    H0 = -logp + _kinetic(p, mass, dense)

    def accept_ratio(eps):
        _, p1, logp1, _ = _leapfrog(vg, z, p, grad, eps, mass, dense)
        H1 = -logp1 + _kinetic(p1, mass, dense)
        return H0 - H1  # log accept ratio

    eps0 = jnp.asarray(1.0, dt)
    direction = jnp.where(accept_ratio(eps0) > math.log(0.5), 1.0, -1.0)

    def cond(carry):
        eps, it = carry
        ratio = accept_ratio(eps)
        keep = jnp.where(direction > 0, ratio > math.log(0.5), ratio < math.log(0.5))
        return keep & (it < 60) & jnp.isfinite(ratio)

    def body(carry):
        eps, it = carry
        return eps * jnp.where(direction > 0, 2.0, 0.5), it + 1

    eps, _ = lax.while_loop(cond, body, (eps0, jnp.asarray(0)))
    return jnp.clip(eps, 1e-6, 1e3)


@partial(jax.jit, static_argnames=("logprob_apply", "num_warmup", "num_samples",
                                   "thinning", "dense_mass", "max_depth",
                                   "adapt_mass"))
def run_chain(logprob_apply, ctx, init_z, key, num_warmup=512, num_samples=1024,
              thinning=4, dense_mass=True, max_depth=6, warm=None,
              adapt_mass=True):
    """Warmup + sampling for a single chain. vmap over (init_z, key) for
    multiple chains. ``logprob_apply(ctx, z)`` evaluates the target; ``ctx``
    is a traced pytree (GP state) so BO iterations don't retrace.

    ``warm`` (with ``adapt_mass=False``): (eps0, mass_inv, mass_chol) from a
    previous run on a nearby target — the mass matrix is FIXED and only the
    step size re-adapts (dual averaging) over a short ``num_warmup``. NUTS
    transitions leave the current target invariant for ANY mass/step size,
    so reuse affects efficiency, not correctness; callers should still guard
    on acceptance/divergence diagnostics and fall back to a cold run.
    Returns (samples (kept, d), logps (kept,), diagnostics)."""
    d = init_z.shape[0]
    dt = init_z.dtype
    vg = jax.value_and_grad(lambda z: logprob_apply(ctx, z))

    k_eps, k_warm, k_run = random.split(key, 3)
    if warm is not None and not adapt_mass:
        eps_w, mass_inv, mass_chol = warm
        mass = MassMatrix(mass_inv, mass_chol)
        eps0 = jnp.clip(eps_w, 1e-6, 1e3)
    else:
        mass = (MassMatrix(jnp.eye(d, dtype=dt), jnp.eye(d, dtype=dt))
                if dense_mass else
                MassMatrix(jnp.ones(d, dt), jnp.ones(d, dt)))
        eps0 = _find_reasonable_eps(vg, init_z, k_eps, mass, dense_mass)
    da = _da_init(eps0)

    logp0, grad0 = vg(init_z)
    state0 = NutsCarry(init_z, logp0, grad0)
    is_mass_update = (_warmup_schedule(num_warmup) if adapt_mass
                      else jnp.zeros(num_warmup, bool))

    def warm_step(carry, inp):
        state, da, mass, wf, key = carry
        k_step, key = random.split(key)
        upd_mass = inp
        eps = jnp.exp(da.log_eps)
        state, accept, _ = nuts_step(vg, k_step, state, eps, mass, dense_mass,
                                     max_depth)
        da = _da_update(da, accept)
        wf = _welford_update(wf, state.z, dense_mass)

        def apply_mass(args):
            da, mass, wf = args
            cov = _welford_cov(wf)
            mass = _mass_from_cov(cov, dense_mass, wf.n)
            # restart step-size adaptation around the current average
            da2 = _da_init(jnp.exp(da.log_eps_avg))
            return da2, mass, _welford_init(d, dense_mass, dt)

        da, mass, wf = lax.cond(upd_mass, apply_mass, lambda a: a, (da, mass, wf))
        return (state, da, mass, wf, key), None

    wf0 = _welford_init(d, dense_mass, dt)
    (state, da, mass, _, _), _ = lax.scan(
        warm_step, (state0, da, mass, wf0, k_warm), is_mass_update)
    eps_final = jnp.exp(da.log_eps_avg)

    def sample_step(carry, _):
        state, key = carry
        k_step, key = random.split(key)
        state, accept, div = nuts_step(vg, k_step, state, eps_final, mass,
                                       dense_mass, max_depth)
        return (state, key), (state.z, state.logp, accept, div)

    (state_end, _), (zs, logps, accepts, divs) = lax.scan(
        sample_step, (state, k_run), None, length=num_samples)
    zs = zs[thinning - 1::thinning]
    logps = logps[thinning - 1::thinning]
    diag = {"mean_accept": jnp.mean(accepts), "n_divergent": jnp.sum(divs),
            "step_size": eps_final,
            # adapted kernel + final state, reusable as next call's `warm`
            "mass_inv": mass.inv, "mass_chol": mass.chol_mass,
            "last_z": state_end.z}
    return zs, logps, diag
