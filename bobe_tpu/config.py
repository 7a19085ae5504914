"""Global configuration for bobe_tpu.

The reference implementation (see /root/reference/BOBE/bo.py:5, gp.py:7) hard-enables
float64 at import time because exact-GP Cholesky factorizations at noise=1e-8 are
ill-conditioned in float32. We keep that default for numerical parity, but expose a
dtype policy so the hot device paths (Gram, Cholesky, acquisition sweeps, samplers)
can run in float32 on TPU where the MXU is ~10x faster, paired with an adaptive
jitter ladder (see ops/chol.py) that restores stability.

Usage::

    import bobe_tpu
    bobe_tpu.config.set_compute_dtype("float32")   # TPU fast path
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Enable x64 before any array is created (parity with reference gp.py:7).
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: compile latency dominates small-problem
# wall time in this environment, and the BO loop's kernels are re-used across
# runs. Opt out with BOBE_TPU_NO_COMP_CACHE=1.
if not os.environ.get("BOBE_TPU_NO_COMP_CACHE"):
    _cache_dir = os.environ.get(
        "BOBE_TPU_COMP_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax versions
        pass

_COMPUTE_DTYPE = jnp.float64

# Row-count padding granularity for GP buffers. 128 matches the TPU lane width /
# MXU tile so padded Gram matrices map cleanly onto hardware tiles.
PAD_MULTIPLE = 128

# Floor used when clipping predicted variances (reference gp.py:16).
SAFE_NOISE_FLOOR = 1e-12


def fit_f64_max_cap() -> int:
    """Largest padded GP capacity at which the hyperparameter FIT runs in
    float64 even when the compute dtype is float32 (TPU). Measured on the
    planck-like parity problem (BENCH_NOTES round 2): the f32 objective's
    jitter floor over-smooths selection in curved low-noise regimes —
    TPU runs read |dlogZ| 0.184 (raw f32) / 0.102 (f32 + f64 polish) /
    0.001 (f64 fits), and the f64-fit run also converged in the FEWEST
    evaluations (216 vs 356/484), making it the best wall-clock-to-accuracy
    default despite ~10 ms/eval emulated-f64 Choleskys at these caps.
    Above the threshold (big toy/bench sets, f32 parity verified there)
    fits stay f32. Override with BOBE_TPU_F64_FIT_MAX_CAP (0 disables).

    NOTE: this default DELIBERATELY equals fit_polish_max_cap() — any cap
    small enough to polish already runs a full f64 fit, so the polish branch
    only engages when BOBE_TPU_F64_FIT_MAX_CAP is lowered below the polish
    cap (tests/test_fast_path.py pins that engagement). Keep the two in sync
    when changing either default."""
    return int(os.environ.get("BOBE_TPU_F64_FIT_MAX_CAP", 768))


def fit_polish_max_cap() -> int:
    """Largest padded GP capacity at which the f64 hyperparameter polish
    runs after an f32 fit. With the default fit_f64_max_cap covering the
    same range, the polish is the quality fallback for setups that disable
    small-cap f64 fits for speed: measured on the planck-like parity
    problem, |dlogZ| = 0.030 at 40 polish iterations vs 0.184 raw f32 and
    0.001 full f64 (BENCH_NOTES). Override with BOBE_TPU_POLISH_MAX_CAP
    (0 disables)."""
    return int(os.environ.get("BOBE_TPU_POLISH_MAX_CAP", 768))


def fit_polish_iters() -> int:
    """L-BFGS iterations for the f64 polish (BOBE_TPU_POLISH_ITERS).
    40 is the measured sweet spot (see fit_polish_max_cap): ~1/5 the cost
    of a full f64 fit for most of its accuracy."""
    return int(os.environ.get("BOBE_TPU_POLISH_ITERS", 40))


def set_compute_dtype(dtype) -> None:
    """Set the dtype used for device-side GP/sampler math ('float32'|'float64')."""
    global _COMPUTE_DTYPE
    dt = jnp.dtype(dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        raise ValueError(f"compute dtype must be float32 or float64, got {dtype}")
    _COMPUTE_DTYPE = jnp.float32 if dt == jnp.dtype(jnp.float32) else jnp.float64


def compute_dtype():
    """Current compute dtype for hot-path kernels."""
    return _COMPUTE_DTYPE


def is_x32() -> bool:
    return _COMPUTE_DTYPE == jnp.float32


# Default policy: float32 hot-path on TPU (MXU-native; f64 is emulated and
# both compiles and runs an order of magnitude slower there), float64 on CPU
# (parity with the reference). The GP state and the evidence integrals stay
# float64 either way. Override with BOBE_TPU_DTYPE.
try:
    if jax.default_backend() == "tpu":
        _COMPUTE_DTYPE = jnp.float32
except Exception:  # pragma: no cover - backend probing must never fail import
    pass

_env_dt = os.environ.get("BOBE_TPU_DTYPE")
if _env_dt:
    set_compute_dtype(_env_dt)
