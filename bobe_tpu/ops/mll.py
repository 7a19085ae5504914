"""Marginal log-likelihood and hyperparameter priors for the GP surrogate.

Functional equivalents of /root/reference/BOBE/gp.py:56-78,170-178,357-366.
Distribution log-densities are implemented in-house (the reference pulls them
from numpyro, which is not a dependency of this framework).

Masking note: with the padded identity Gram of ops/kernels.gram_masked the pad
rows contribute log(diag)=0 and y_pad=0, so the standard MLL expression is
exact on padded buffers with no extra masking.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from . import chol as chol_ops

LOG_2PI = math.log(2.0 * math.pi)
SQRT2 = math.sqrt(2.0)
SQRT3 = math.sqrt(3.0)


# --------------------------------------------------------------- distributions

def lognormal_logprob(x, loc, scale):
    # dtype-aware underflow clamp: 1e-300 is 0.0 in float32, where x=0 would
    # produce inf + (-inf) = NaN instead of a clean large-negative logprob
    x = jnp.maximum(x, jnp.finfo(jnp.result_type(x)).tiny)
    lx = jnp.log(x)
    return -lx - jnp.log(scale) - 0.5 * LOG_2PI - 0.5 * ((lx - loc) / scale) ** 2


def halfcauchy_logprob(x, scale):
    lp = math.log(2.0 / math.pi) - jnp.log(scale) - jnp.log1p((x / scale) ** 2)
    return jnp.where(x >= 0, lp, -jnp.inf)


def uniform_logprob(x, low, high):
    inside = jnp.logical_and(x >= low, x <= high)
    return jnp.where(inside, -jnp.log(high - low), -jnp.inf)


def normal_logprob(x, loc, scale):
    return -0.5 * LOG_2PI - jnp.log(scale) - 0.5 * ((x - loc) / scale) ** 2


def gamma_logprob(x, concentration, rate=1.0):
    from jax.scipy.special import gammaln

    x = jnp.maximum(x, jnp.finfo(jnp.result_type(x)).tiny)  # see lognormal_logprob
    return (
        concentration * jnp.log(rate)
        - gammaln(concentration)
        + (concentration - 1.0) * jnp.log(x)
        - rate * x
    )


_DIST_TABLE = {
    "lognormal": lambda x, s: lognormal_logprob(x, s.get("loc", 0.0), s.get("scale", 1.0)),
    "halfcauchy": lambda x, s: halfcauchy_logprob(x, s.get("scale", 1.0)),
    "uniform": lambda x, s: uniform_logprob(x, s.get("low", 0.0), s.get("high", 1.0)),
    "normal": lambda x, s: normal_logprob(x, s.get("loc", 0.0), s.get("scale", 1.0)),
    "gamma": lambda x, s: gamma_logprob(x, s.get("concentration", 1.0), s.get("rate", 1.0)),
}


def spec_logprob(spec: dict, x):
    """Log-density from a {'name': ..., **params} spec (reference gp.py:27-54)."""
    name = spec["name"].lower()
    if name not in _DIST_TABLE:
        raise ValueError(f"Unknown distribution '{spec['name']}'")
    return _DIST_TABLE[name](x, spec)


# ---------------------------------------------------------------------- priors

def dslp_lengthscale_logprob(lengthscales, ndim):
    """Dimension-scaled lengthscale prior: LogNormal(sqrt2 + 0.5 log d, sqrt3)
    per ARD lengthscale (reference gp.py:330)."""
    loc = SQRT2 + 0.5 * math.log(ndim)
    return jnp.sum(lognormal_logprob(lengthscales, loc, SQRT3))


def saas_logprob(lengthscales, kernel_variance, tausq):
    """SAAS sparsity prior (reference gp.py:56-78): LogNormal(0,1) amplitude,
    HalfCauchy(0.1) global shrinkage, HalfCauchy(1) on 1/(tausq ls^2)."""
    lp = lognormal_logprob(kernel_variance, 0.0, 1.0)
    lp += halfcauchy_logprob(tausq, 0.1)
    inv_ls_sq = 1.0 / (tausq * lengthscales**2)
    lp += jnp.sum(halfcauchy_logprob(inv_ls_sq, 1.0))
    return lp


# ------------------------------------------------------------------------- MLL

def gp_mll(K, y, n):
    """Gaussian-process marginal log-likelihood on padded buffers.

    K: (cap, cap) masked Gram; y: (cap,) standardized targets, pad zeros;
    n: active count (scalar, may be traced).
    """
    L = chol_ops.cholesky(K)
    alpha = chol_ops.cho_solve(L, y)
    quad = jnp.dot(y, alpha)
    logdet = jnp.sum(jnp.log(jnp.diagonal(L)))  # pad diag = 1 -> contributes 0
    return -0.5 * quad - logdet - 0.5 * n * LOG_2PI
