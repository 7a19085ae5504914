"""bobe_tpu — TPU-native Bayesian Optimisation for Bayesian Evidence.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Ameek94/BOBE:
Gaussian-process surrogate modelling of expensive log-likelihoods, evidence-
weighted acquisition, and fully on-device nested sampling / NUTS over the
surrogate to produce the Bayesian evidence (logZ) and posterior samples.
"""
from . import config  # noqa: F401  (enables x64, sets dtype policy)
from .utils.log import setup_logging

setup_logging("INFO")

from .models.gp import GP  # noqa: E402,F401

__version__ = "0.1.0"

__all__ = ["GP", "config"]
