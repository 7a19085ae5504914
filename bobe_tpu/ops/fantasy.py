"""Fantasy-variance math for evidence-weighted acquisition.

The reference evaluates WIPV/WIPStd one candidate at a time: extend the
Cholesky by the candidate (rank-1), re-solve an (N+1) x n_mc triangular system,
and average the resulting variances (/root/reference/BOBE/gp.py:552-576,
acquisition.py:390-397 via lax.map). That costs O(n_c * N^2 * n_mc).

This module uses the algebraically identical rank-1 posterior-update identity:
adding candidate c to the training set changes the posterior variance at m to

    var'(m) = var(m) - cov(c, m)^2 / var(c)

where cov/var are the *current* posterior (co)variances with noisy diagonal
(var includes the observation noise, matching kernel_diag(include_noise=True)
in the reference). Proof: with L' = [[L, 0], [v_c, d_c]], the extra solve row is
w_m = (k(c,m) - v_c . v_m) / d_c = cov(c,m)/sqrt(var(c)), and the fantasy
variance is var(m) - w_m^2.

For a candidate pool equal to the MC point set this collapses the whole sweep
into ONE triangular solve + ONE (n_mc, cap)@(cap, n_mc) matmul — an O(N)-fold
algorithmic speedup that also moves the FLOPs onto the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import config
from . import chol as chol_ops
from . import kernels as kr


def posterior_batch(kernel_name, x_pad, mask, L, xq, lengthscales, amp, noise):
    """Posterior solve payload for query points xq (m, d).

    Returns (V, var):
      V:   (cap, m) = L^-1 K(X, xq)   (pad rows zero)
      var: (m,)     = amp + noise - sum(V^2, 0)   [noisy posterior variance,
                       standardized scale, clipped to the safe floor]
    """
    K12 = kr.cross_kernel_masked(kernel_name, x_pad, mask, xq, lengthscales, amp)
    V = chol_ops.tri_solve(L, K12)
    var = amp + noise - jnp.sum(V * V, axis=0)
    var = jnp.where(jnp.isnan(var), config.SAFE_NOISE_FLOOR, var)
    var = jnp.maximum(var, config.SAFE_NOISE_FLOOR)
    return V, var


def wip_sweep(kernel_name, xq, V, var, lengthscales, amp, noise, y_std, use_std,
              n_valid=None):
    """Evaluate WIPV / WIPStd for every candidate in the MC pool at once.

    xq: (m, d) MC points (= candidate pool); V, var from posterior_batch.
    Returns acq: (m,) where acq[c] = mean_m g(var'(m | add c)) * y_std^p,
    g = identity (WIPV, p=2) or sqrt (WIPStd, p=1) — matching the reference's
    physical-scale convention (gp.py:576).

    n_valid (static): when the pool was padded for even device sharding, the
    integration mean runs over the first n_valid columns only — padded
    duplicate columns would otherwise bias every candidate's value toward
    the repeated point.
    """
    Kqq = kr.cross_kernel(kernel_name, xq, xq, lengthscales, amp)
    C = Kqq - V.T @ V  # (m, m) posterior cross-covariance cov(c, m)
    fantasy = var[None, :] - (C * C) / var[:, None]
    fantasy = jnp.where(jnp.isnan(fantasy), config.SAFE_NOISE_FLOOR, fantasy)
    fantasy = jnp.maximum(fantasy, config.SAFE_NOISE_FLOOR)
    if n_valid is not None:
        fantasy = fantasy[:, :n_valid]
    if use_std:
        return jnp.mean(jnp.sqrt(fantasy), axis=1) * y_std
    return jnp.mean(fantasy, axis=1) * y_std**2


def wip_greedy_batch(kernel_name, xq, V, var, lengthscales, amp, noise,
                     y_std, use_std, n_batch: int):
    """Select a greedy batch of n_batch pool candidates in one fused kernel.

    Equivalent to the reference's hallucination loop (append the GP-mean
    "fantasy" observation, re-optimize; acquisition.py:147-196) restricted to
    pool candidates: adding a point with y = its predicted mean leaves the
    posterior MEAN unchanged (kriging property) and updates the covariance by
    the rank-1 downdate

        var'(m)   = var(m)   - w_m^2,      w = C[i*, :] / sqrt(var(i*))
        C'(a, m)  = C(a, m)  - w_a w_m

    so the whole batch needs NO Cholesky updates and no dummy GP — just
    n_batch rounds of elementwise updates on the (m, m) posterior covariance.
    Returns (idx (n_batch,), acq_vals (n_batch,)).
    """
    Kqq = kr.cross_kernel(kernel_name, xq, xq, lengthscales, amp)
    C = Kqq - V.T @ V
    scale = y_std if use_std else y_std**2

    idxs = []
    vals = []
    # already-selected candidates are masked out of the argmin so a batch can
    # never contain duplicates even when a degenerate downdate leaves the
    # selected candidate's acquisition unchanged
    taken = jnp.zeros((xq.shape[0],), dtype=bool)
    for _ in range(n_batch):
        fantasy = var[None, :] - (C * C) / var[:, None]
        fantasy = jnp.maximum(
            jnp.where(jnp.isnan(fantasy), config.SAFE_NOISE_FLOOR, fantasy),
            config.SAFE_NOISE_FLOOR)
        red = jnp.sqrt(fantasy) if use_std else fantasy
        acq = jnp.mean(red, axis=1) * scale
        acq_masked = jnp.where(taken, jnp.inf, acq)
        i_star = jnp.argmin(acq_masked)
        taken = taken.at[i_star].set(True)
        idxs.append(i_star)
        vals.append(acq[i_star])
        w = C[i_star, :] / jnp.sqrt(jnp.maximum(var[i_star], config.SAFE_NOISE_FLOOR))
        var = jnp.maximum(var - w * w, config.SAFE_NOISE_FLOOR)
        C = C - jnp.outer(w, w)
    return jnp.stack(idxs), jnp.stack(vals)


def fantasy_var_single(
    kernel_name, x_pad, mask, L, x_new, mc_points, V, var_mc,
    lengthscales, amp, noise,
):
    """Fantasy variance at mc_points after adding one arbitrary point x_new.

    Differentiable in x_new; used for the local refinement polish of the best
    MC candidate (reference acquisition.py:400-412). V/var_mc are the cached
    posterior_batch payload for mc_points.
    """
    k_new = kr.cross_kernel_masked(
        kernel_name, x_pad, mask, x_new[None, :], lengthscales, amp
    )  # (cap, 1)
    v_new = chol_ops.tri_solve(L, k_new)[:, 0]  # (cap,)
    var_new = amp + noise - jnp.dot(v_new, v_new)
    var_new = jnp.maximum(var_new, config.SAFE_NOISE_FLOOR)
    k_nm = kr.cross_kernel(kernel_name, x_new[None, :], mc_points, lengthscales, amp)[0]
    cov = k_nm - v_new @ V  # (m,)
    fantasy = var_mc - cov * cov / var_new
    fantasy = jnp.where(jnp.isnan(fantasy), config.SAFE_NOISE_FLOOR, fantasy)
    return jnp.maximum(fantasy, config.SAFE_NOISE_FLOOR)
