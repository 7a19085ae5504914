"""Cholesky factorizations, block extensions and solves on padded buffers.

The reference recomputes a full O(N^3) Cholesky every time points are added
(/root/reference/BOBE/gp.py:544-550) and only uses its rank-1 update for
"fantasy" variances (gp.py:181-197). Here the incremental block extension is
the *primary* update path: adding b points to an N-point factor costs
O(cap^2 b) instead of O(cap^3), and is exact because the kernel matrix does not
depend on the targets (re-standardizing y only changes alpha, not L).

All factors live on padded (cap, cap) buffers whose pad block is the identity
(see ops/kernels.gram_masked), so triangular solves against padded right-hand
sides are exact with zero masking overhead.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_solve as _cho_solve
from jax.scipy.linalg import solve_triangular

# Relative jitter ladder used when a factorization fails in low precision.
JITTER_LADDER = (0.0, 1e-10, 1e-8, 1e-6, 1e-4)


def cholesky(K):
    """Lower Cholesky of a padded masked Gram matrix."""
    return jnp.linalg.cholesky(K)


# NOTE: a right-looking blocked f64 Cholesky variant lived here through
# round 2 claiming ~10x over jnp.linalg.cholesky on TPU-emulated f64; on the
# current XLA it measures at exact parity (70.0 vs 70.0 ms at n=1024, TPU
# v5e — the emulated f64 matmuls now cost the same as the emulated chol), so
# it was removed (BENCH_NOTES round 3).


def cholesky_jittered(K, mask, amp):
    """Cholesky with an adaptive relative-jitter ladder.

    Retries with geometrically growing diagonal jitter (relative to the kernel
    amplitude ``amp``) until the factor is finite. In float64 the first rung
    virtually always succeeds so the loop body runs once; the ladder is what
    makes the float32 TPU fast-path safe.
    """
    eye = jnp.eye(K.shape[0], dtype=K.dtype) * mask[:, None] * mask[None, :]
    ladder = jnp.asarray(JITTER_LADDER, dtype=K.dtype)

    def cond(carry):
        i, L = carry
        return jnp.logical_and(i < len(JITTER_LADDER), ~jnp.all(jnp.isfinite(L)))

    def body(carry):
        i, _ = carry
        L = jnp.linalg.cholesky(K + (ladder[i] * amp) * eye)
        return i + 1, L

    _, L0 = body((0, jnp.full_like(K, jnp.nan)))
    _, L = lax.while_loop(cond, body, (1, L0))
    return L


def cho_solve(L, b):
    """Solve K x = b given lower Cholesky L (padded-exact)."""
    return _cho_solve((L, True), b)


def tri_solve(L, b):
    """Solve L v = b (lower-triangular forward solve)."""
    return solve_triangular(L, b, lower=True)


def extend_cholesky_block(L, K21, K22):
    """Extend a Cholesky factor by a block of b rows.

    Given L = chol(K11) (cap, cap, padded-identity), K21 (b, cap) the
    cross-covariance of the new points against the padded training rows, and
    K22 (b, b) their self-covariance (identity rows/cols for pad slots),
    returns (L21, L22) with

        [[K11, K21^T], [K21, K22]] = [[L, 0], [L21, L22]] @ (...)^T

    Generalizes the reference's rank-1 ``fast_update_cholesky`` (gp.py:181).
    """
    L21 = solve_triangular(L, K21.T, lower=True).T  # (b, cap)
    S = K22 - L21 @ L21.T
    S = 0.5 * (S + S.T)
    L22 = jnp.linalg.cholesky(S)
    return L21, L22


@partial(jax.jit)
def rank1_extend(L, k, k_self):
    """Single-point Cholesky extension returning the (n+1, n+1) dense factor.

    Kept for API parity with the reference ``fast_update_cholesky``
    (gp.py:181-197); the hot acquisition path uses the algebraic identity in
    ops/fantasy.posterior_cov instead, which avoids building L' at all.
    """
    v = solve_triangular(L, k, lower=True)
    diag = jnp.sqrt(k_self - jnp.dot(v, v))
    n = L.shape[0]
    out = jnp.zeros((n + 1, n + 1), dtype=L.dtype)
    out = out.at[:n, :n].set(L)
    out = out.at[n, :n].set(v)
    out = out.at[n, n].set(diag)
    return out
