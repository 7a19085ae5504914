"""On-device inference engines: NUTS and vectorized nested sampling."""
from . import integrals, nested, nuts  # noqa: F401
