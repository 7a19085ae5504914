"""GP covariance kernels on padded, masked buffers.

TPU-first re-design of the reference kernels (/root/reference/BOBE/gp.py:80-168):

* Squared distances use the ``|a|^2 + |b|^2 - 2 a.b`` expansion so the O(n^2 d)
  work is a single MXU matmul instead of an (n1, n2, d) broadcast that would
  stream through HBM (the reference materialises that 3-D tensor, gp.py:96).
* All Gram builders take an activity mask: buffers are padded to a static
  capacity (multiple of 128) so XLA compiles each bucket once. Pad rows/cols
  are forced to identity ``K[i,i]=1, K[i,j]=0`` which makes the padded Cholesky
  factor block-diagonal ``[[L, 0], [0, I]]`` — downstream solves are then exact
  without any masking (see ops/chol.py).

Supported kernels match the reference: RBF and Matern-5/2, both with ARD
lengthscales and a global variance (amplitude) parameter.
"""
from __future__ import annotations

import math
import os

import jax.numpy as jnp

SQRT5 = math.sqrt(5.0)

# Optional fused Pallas backend for gram_masked (see its docstring). The env
# flag is read at import, but the backend probe is LAZY: jax.default_backend()
# initializes the platform, and importing bobe_tpu must never touch an
# accelerator (MultiprocessPool likelihood workers import this module via the
# package facade — a second client on a single-process TPU runtime deadlocks;
# see parallel/pool._mp_init and config._resolve_default_dtype).
_PALLAS_GRAM = os.environ.get("BOBE_TPU_PALLAS_GRAM", "0") == "1"
_PALLAS_INTERPRET = None


def _pallas_interpret() -> bool:
    """Interpret mode engages automatically off-TPU so the Pallas wiring
    stays testable on the CPU suite. Resolved on first gram build."""
    global _PALLAS_INTERPRET
    if _PALLAS_INTERPRET is None:
        try:
            import jax

            _PALLAS_INTERPRET = jax.default_backend() != "tpu"
        except Exception:  # pragma: no cover
            _PALLAS_INTERPRET = True
    return _PALLAS_INTERPRET


def sq_dist(xa, xb):
    """Pairwise squared Euclidean distances, (n1, d) x (n2, d) -> (n1, n2).

    Uses the matmul expansion; tiny negatives from cancellation are clamped.
    """
    a2 = jnp.sum(xa * xa, axis=-1)[:, None]
    b2 = jnp.sum(xb * xb, axis=-1)[None, :]
    ab = xa @ xb.T
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def _corr(name: str, dsq):
    """Correlation (unit-variance kernel) from squared scaled distances."""
    if name == "rbf":
        return jnp.exp(-0.5 * dsq)
    elif name == "matern":
        d = jnp.sqrt(jnp.maximum(dsq, 1e-30))
        return (1.0 + SQRT5 * d + (5.0 / 3.0) * dsq) * jnp.exp(-SQRT5 * d)
    raise ValueError(f"Unknown kernel '{name}' (expected 'rbf' or 'matern')")


def cross_kernel(name, xa, xb, lengthscales, kernel_variance):
    """Dense cross-covariance K(xa, xb), no noise, no masking."""
    dsq = sq_dist(xa / lengthscales, xb / lengthscales)
    return kernel_variance * _corr(name, dsq)


def kernel_diag(n, kernel_variance, noise, include_noise=True, dtype=None):
    """Diagonal of K(x, x): constant amplitude (+ noise)."""
    diag = kernel_variance * jnp.ones((n,), dtype=dtype)
    if include_noise:
        diag = diag + noise
    return diag


def sq_dist_perdim(x):
    """Per-dimension pairwise squared differences: (cap, d) -> (d, cap, cap).

    Hyperparameter-independent — computed ONCE per fit so that every MLL
    evaluation inside the optimizer loop reduces to a bandwidth-bound
    weighted sum over d slabs plus the kernel nonlinearity, instead of
    rebuilding scaled distances (measured ~2.2x faster fits at cap=1024 on
    TPU). Exact differences (no matmul-expansion cancellation).
    """
    xt = x.T  # (d, cap)
    diff = xt[:, :, None] - xt[:, None, :]
    return diff * diff


def gram_masked_perdim(name, dsq_perdim, mask, lengthscales, kernel_variance,
                       noise):
    """gram_masked built from precomputed per-dimension squared distances."""
    w = 1.0 / (lengthscales * lengthscales)
    dsq = jnp.tensordot(w, dsq_perdim, axes=1)  # (cap, cap)
    k = kernel_variance * _corr(name, dsq)
    mm = mask[:, None] * mask[None, :]
    eye = jnp.eye(dsq.shape[0], dtype=k.dtype)
    return k * mm + (noise * mask + (1.0 - mask)) * eye


def gram_masked(name, x, mask, lengthscales, kernel_variance, noise):
    """Padded training Gram matrix with identity pad block.

    x: (cap, d) padded inputs; mask: (cap,) 1.0 for active rows.
    Returns K with K[active,active] = k(x,x) + noise*I, K[pad,pad] = I,
    and zero cross blocks. Its Cholesky is [[L_active, 0], [0, I]].

    BOBE_TPU_PALLAS_GRAM=1 routes eligible f32 builds through the fused
    single-launch Pallas kernel (ops/pallas_gram.py). Measured at speed
    PARITY with this XLA version on TPU v5e (0.68-0.76 ms at cap 512-1024,
    ratio 0.92-1.03x — XLA already fuses the distance matmul + nonlinearity
    + masking; both are dispatch-latency-bound at these caps), so it is an
    optional backend, not the default.
    """
    if (_PALLAS_GRAM and x.dtype == jnp.float32 and x.shape[0] % 128 == 0
            and x.shape[0] <= 1024 and x.shape[1] <= 128):
        from .pallas_gram import gram_masked_pallas

        return gram_masked_pallas(name, x, mask, lengthscales,
                                  kernel_variance, noise,
                                  interpret=_pallas_interpret())
    k = cross_kernel(name, x, x, lengthscales, kernel_variance)
    mm = mask[:, None] * mask[None, :]
    eye = jnp.eye(x.shape[0], dtype=k.dtype)
    k = k * mm + (noise * mask + (1.0 - mask)) * eye
    return k


def cross_kernel_masked(name, x_train, mask, xq, lengthscales, kernel_variance):
    """K(x_train, xq) with pad training rows zeroed: (cap, m)."""
    k = cross_kernel(name, x_train, xq, lengthscales, kernel_variance)
    return k * mask[:, None]
