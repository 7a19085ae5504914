"""Numerically-stable special functions used by acquisition math.

Pure-JAX replacements for the tfp helpers the reference leans on
(/root/reference/BOBE/acquisition.py:33-42 uses tfp.math.erfcx / log1mexp);
tensorflow_probability is not a dependency here.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erfc
from jax.scipy.stats import norm

_LOG2 = 0.6931471805599453


_CF_DEPTH = 60
_CF_CUT = 2.0


def erfcx(x):
    """Scaled complementary error function exp(x^2) * erfc(x).

    For x < 2 the definition is evaluated directly (jax's erfc is accurate to
    ~1e-13 there). For x >= 2 we evaluate the classical Laplace continued
    fraction erfcx(x) = pi^{-1/2} / (x + (1/2)/(x + 1/(x + (3/2)/(x + ...))))
    bottom-up with 60 levels, which is ~machine precision on [2, inf) —
    jax's erfc itself loses relative accuracy in the tail. Validated against
    scipy.special.erfcx in tests/test_ops.py.
    """
    x = jnp.asarray(x)
    xs = jnp.minimum(x, _CF_CUT)  # keep exp(x^2) finite in the unused branch
    direct = jnp.exp(xs * xs) * erfc(xs)

    xl = jnp.maximum(x, _CF_CUT)
    r = jnp.zeros_like(xl)
    for k in range(_CF_DEPTH, 0, -1):
        r = (0.5 * k) / (xl + r)
    cf = (1.0 / jnp.sqrt(jnp.pi)) / (xl + r)

    return jnp.where(x < _CF_CUT, direct, cf)


def log1mexp(x):
    """log(1 - exp(x)) for x < 0, stable near both 0 and -inf."""
    x = jnp.asarray(x)
    # For x > -log 2 use log(-expm1(x)); else log1p(-exp(x)).
    big = jnp.where(x > -_LOG2, x, -_LOG2)
    small = jnp.where(x <= -_LOG2, x, -2.0 * _LOG2)
    return jnp.where(x > -_LOG2, jnp.log(-jnp.expm1(big)), jnp.log1p(-jnp.exp(small)))


# ----------------------------------------------------------------- EI helpers
# Stable (log-)expected-improvement helpers following Ament et al. 2023
# (arXiv:2310.20708), the same branching strategy as the reference
# acquisition.py:29-75 but with in-house erfcx/log1mexp.

def _log_phi(u):
    return -0.5 * (u * u + jnp.log(2.0 * jnp.pi))


def ei_helper(u):
    """EI(u) = phi(u) + u * Phi(u)."""
    return norm.pdf(u) + u * norm.cdf(u)


def _log_abs_u_Phi_div_phi(u):
    """log(|u| Phi(u) / phi(u)) for u < 0, via erfcx for tail stability."""
    inv_sqrt2 = 1.0 / jnp.sqrt(2.0)
    log_sqrt_pi_div_2 = 0.5 * jnp.log(jnp.pi / 2.0)
    return jnp.log(jnp.abs(u) * erfcx(-inv_sqrt2 * u)) + log_sqrt_pi_div_2


def log_ei_helper(u):
    """Accurate log(phi(u) + u Phi(u)) over the whole real line."""
    u = jnp.asarray(u)
    if u.dtype not in (jnp.float32, jnp.float64):
        raise TypeError(f"log_ei_helper supports float32/float64, got {u.dtype}")
    bound = -1.0
    neg_inv_sqrt_eps = -1e6 if u.dtype == jnp.float64 else -1e3

    u_upper = jnp.maximum(u, bound)
    log_ei_upper = jnp.log(ei_helper(u_upper))

    u_lower = jnp.minimum(u, bound)
    u_eps = jnp.maximum(u_lower, neg_inv_sqrt_eps)
    w = _log_abs_u_Phi_div_phi(u_eps)
    second = jnp.where(
        u > neg_inv_sqrt_eps, log1mexp(w), -2.0 * jnp.log(jnp.abs(u_lower))
    )
    log_ei_lower = _log_phi(u) + second
    return jnp.where(u > bound, log_ei_upper, log_ei_lower)
