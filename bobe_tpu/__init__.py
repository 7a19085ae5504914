"""bobe_tpu — TPU-native Bayesian Optimisation for Bayesian Evidence.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Ameek94/BOBE:
Gaussian-process surrogate modelling of expensive log-likelihoods, evidence-
weighted acquisition, and fully on-device nested sampling / NUTS over the
surrogate to produce the Bayesian evidence (logZ) and posterior samples.

Public facade mirrors the reference package exports
(/root/reference/BOBE/__init__.py:41-95).
"""
import os as _os

if (_os.environ.get("BOBE_TPU_SERVER")
        and _os.environ.get("BOBE_TPU_SERVER_ROLE") != "server"):
    # Device-server client mode (server.py): the server process owns the
    # accelerator; this process only evaluates likelihoods and orchestrates
    # IO, so pin it to the host CPU backend BEFORE any jax backend init —
    # two processes contending for one tunneled TPU would fail or thrash.
    # The marker tells client.ensure_server the pin is ours, so a spawned
    # server's env gets it stripped while a user-exported JAX_PLATFORMS is
    # honored.
    if "JAX_PLATFORMS" not in _os.environ:
        _os.environ["JAX_PLATFORMS"] = "cpu"
        _os.environ["BOBE_TPU_CLIENT_PINNED"] = "1"
    # belt-and-braces: some environments pre-import jax from a sitecustomize
    # hook that pins a platform over the env var; jax.config wins as long as
    # no backend has been initialized yet (nothing in this package touches a
    # device at import — pinned by tests/test_parallel.py)
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from . import config  # noqa: F401  (enables x64, sets dtype policy, comp cache)
from .utils.log import setup_logging

setup_logging("INFO")

from .acquisition import (  # noqa: E402,F401
    EI,
    WIPV,
    AcquisitionFunction,
    LogEI,
    WIPStd,
    get_mc_points,
    get_mc_samples,
)
from .bo import BOBE, load_gp_file  # noqa: E402,F401
from .likelihood import CobayaLikelihood, Likelihood  # noqa: E402,F401
from .models.classifiers import CLASSIFIER_REGISTRY  # noqa: E402,F401
from .models.clf_gp import GPwithClassifier  # noqa: E402,F401
from .models.gp import GP, GPState, GPTrainConfig  # noqa: E402,F401
from .samplers import nested_sampling, sample_gp_ensemble, sample_gp_nuts  # noqa: E402,F401
from .utils.core import scale_from_unit, scale_to_unit  # noqa: E402,F401
from .utils.log import get_logger  # noqa: E402,F401
from .utils.plot import BOBESummaryPlotter  # noqa: E402,F401
from .utils.results import BOBEResults  # noqa: E402,F401

__version__ = "0.4.1"

__all__ = [
    "BOBE",
    "GP",
    "GPState",
    "GPTrainConfig",
    "GPwithClassifier",
    "Likelihood",
    "CobayaLikelihood",
    "EI",
    "LogEI",
    "WIPV",
    "WIPStd",
    "AcquisitionFunction",
    "BOBEResults",
    "CLASSIFIER_REGISTRY",
    "nested_sampling",
    "sample_gp_nuts",
    "sample_gp_ensemble",
    "get_mc_samples",
    "get_mc_points",
    "load_gp_file",
    "config",
    # utility exports matching the reference facade (__init__.py:58-68)
    "BOBESummaryPlotter",
    "get_logger",
    "setup_logging",
    "scale_to_unit",
    "scale_from_unit",
]
