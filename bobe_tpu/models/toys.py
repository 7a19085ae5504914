"""Analytic toy likelihoods used across examples, tests and benchmarks.

These mirror the reference's example problems (/root/reference/examples/*.py)
so logZ / posterior parity can be checked problem-by-problem. All functions
take a 1-D parameter vector (physical space) and return a scalar log-density;
``*_bounds`` give the matching prior boxes (2, d).
"""
from __future__ import annotations

import numpy as np


def banana(x):
    """Curved-degeneracy 2-D banana (reference examples/Banana.py:14-18)."""
    return -0.25 * (5.0 * (0.2 - x[0])) ** 2 - (20.0 * (x[1] / 4.0 - x[0] ** 4)) ** 2


banana_bounds = np.array([[-1.0, 1.0], [-1.0, 2.0]]).T
banana_names = ["x1", "x2"]


def himmelblau(x):
    """Negative Himmelblau function; four symmetric modes, logZ ~ -3.2 on
    [-5, 5]^2 (reference docs detailed_usage.rst:197)."""
    return -((x[0] ** 2 + x[1] - 11.0) ** 2 + (x[0] + x[1] ** 2 - 7.0) ** 2)


himmelblau_bounds = np.array([[-5.0, 5.0], [-5.0, 5.0]]).T
himmelblau_names = ["x1", "x2"]


def rosenbrock(x):
    """Negative Rosenbrock in 2-D."""
    return -((1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2)


rosenbrock_bounds = np.array([[-5.0, 5.0], [-5.0, 5.0]]).T
rosenbrock_names = ["x1", "x2"]


def gaussian_ring(x, radius=2.0, width=0.1):
    """Ring-shaped density in 2-D."""
    r = np.sqrt(x[0] ** 2 + x[1] ** 2)
    return -0.5 * ((r - radius) / width) ** 2


gaussian_ring_bounds = np.array([[-4.0, 4.0], [-4.0, 4.0]]).T


def make_gaussian(d, mean=None, sigma=0.1, bounds_width=1.0):
    """d-dim Gaussian with ANALYTIC logZ on the box [0, bounds_width]^d.

    Used as the gold-standard integration test: with the likelihood normalized
    (coefficient included), logZ = -log(volume) + log(mass inside box).
    For sigma << box, logZ ~ -d*log(bounds_width).
    """
    mean = np.full(d, 0.5 * bounds_width) if mean is None else np.asarray(mean)

    def loglike(x):
        x = np.asarray(x)
        return float(
            -0.5 * np.sum(((x - mean) / sigma) ** 2)
            - 0.5 * d * np.log(2 * np.pi * sigma**2)
        )

    bounds = np.array([[0.0, bounds_width]] * d).T
    # evidence of the *likelihood* over a uniform prior on the box:
    # Z = (1/V) * integral(L dx); for mean at center and sigma << width the
    # Gaussian mass inside the box ~ 1, so logZ = -d log(width).
    from scipy.stats import norm

    mass = 1.0
    for j in range(d):
        mass *= norm.cdf((bounds[1, j] - mean[j]) / sigma) - norm.cdf(
            (bounds[0, j] - mean[j]) / sigma
        )
    logz = float(np.log(mass) - d * np.log(bounds_width))
    return loglike, bounds, logz
