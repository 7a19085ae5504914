"""Device-side numerical primitives: kernels, Cholesky, MLL, special
functions, fantasy-variance algebra and bounded optimizers."""
from . import chol, fantasy, kernels, mll, optimize, special  # noqa: F401
