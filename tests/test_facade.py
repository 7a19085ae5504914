"""Facade parity: the public export surface of ``bobe_tpu``.

The reference package re-exports a fixed set of names from its top-level
``__init__`` (/root/reference/BOBE/__init__.py:41-95); a user switching from
the reference must find every one of them here. ``CobayaLikelihood`` is
exported unconditionally in this package (it raises a clear ImportError at
*use* time when cobaya is absent rather than vanishing from the facade).
"""
import numpy as np

import bobe_tpu

# Names the reference facade guarantees (reference __init__.py:70-92 plus the
# conditional CobayaLikelihood append at :93-95).
REFERENCE_EXPORTS = [
    "__version__",
    "BOBE",
    "GP",
    "GPwithClassifier",
    "Likelihood",
    "CobayaLikelihood",
    "EI",
    "LogEI",
    "WIPV",
    "WIPStd",
    "BOBEResults",
    "BOBESummaryPlotter",
    "get_logger",
    "setup_logging",
    "scale_to_unit",
    "scale_from_unit",
]


def test_reference_exports_present():
    for name in REFERENCE_EXPORTS:
        assert hasattr(bobe_tpu, name), f"missing facade export: {name}"
        if name != "__version__":
            assert name in bobe_tpu.__all__, f"{name} not in __all__"


def test_all_names_resolve():
    for name in bobe_tpu.__all__:
        assert getattr(bobe_tpu, name, None) is not None, name


def test_scaling_helpers_roundtrip():
    bounds = np.array([[-2.0, 0.0], [4.0, 10.0]])
    x = np.array([[1.0, 5.0], [-2.0, 10.0]])
    u = bobe_tpu.scale_to_unit(x, bounds)
    assert u.min() >= 0.0 and u.max() <= 1.0
    np.testing.assert_allclose(bobe_tpu.scale_from_unit(u, bounds), x)


def test_logger_namespace():
    assert bobe_tpu.get_logger("zzz").name == "bobe_tpu.zzz"


def test_version_is_pep440ish():
    parts = bobe_tpu.__version__.split(".")
    assert len(parts) >= 2 and all(p.isdigit() for p in parts[:2])
