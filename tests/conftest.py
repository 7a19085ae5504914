"""Test configuration: run on a faked 8-device CPU platform.

Mirrors the reference's only multi-device test mechanism
(/root/reference/tests/test_mpi.py:12): XLA host-platform device-count faking
lets sharding/mesh code paths execute without TPU hardware.

NOTE: in this environment jax is pre-imported at interpreter startup with the
axon TPU platform selected, so the platform switch must go through
``jax.config`` (the backend is initialized lazily — this works as long as no
array has been created yet).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fixed_seed():
    from bobe_tpu.utils.seed import set_global_seed

    set_global_seed(42)
    yield


@pytest.fixture(autouse=True, scope="module")
def _slim_process_between_modules():
    """Drop compiled-executable state after each test module.

    XLA:CPU segfaults (SIGSEGV/SIGABRT, nondeterministic) while compiling or
    (de)serializing the NUTS/NS mega-graphs once the suite process has
    accumulated a few hundred loaded executables — observed repeatedly at
    ~97% of the full run, while any subset of the suite passes. Clearing the
    jit caches between modules keeps the process at subset-scale; recompiles
    are absorbed by the persistent compile cache for small graphs.
    """
    yield
    jax.clear_caches()
