"""Global seed / PRNG registry.

Single source of randomness for the whole framework, mirroring the reference
registry (/root/reference/BOBE/utils/seed.py): one global seed feeds Python's
``random``, a NumPy ``Generator`` and a JAX PRNG key chain. Distributed processes
offset the seed by their process index (reference pool.py:81-83) so workers draw
decorrelated streams.
"""
from __future__ import annotations

import os
import random as _pyrandom

import jax
import jax.random as jrandom
import numpy as np

from .log import get_logger, process_index

log = get_logger("seed")

_global_seed: int | None = None
_np_rng: np.random.Generator | None = None
_jax_key: jax.Array | None = None


def set_global_seed(seed: int | None = None, rank_offset: bool = True) -> int:
    """Seed python/numpy/jax RNGs. Returns the seed used."""
    global _global_seed, _np_rng, _jax_key
    if seed is None:
        seed = _pyrandom.randint(0, 2**31 - 1)
        log.info(f"No seed provided; generated random seed {seed}")
    if not isinstance(seed, (int, np.integer)) or seed < 0:
        raise ValueError("Seed must be a non-negative integer or None")
    seed = int(seed)
    if rank_offset:
        seed = seed + process_index()
    _global_seed = seed
    _pyrandom.seed(seed)
    _np_rng = np.random.default_rng(seed)
    _jax_key = jrandom.PRNGKey(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def _ensure() -> None:
    if _global_seed is None:
        set_global_seed()


def get_global_seed() -> int:
    _ensure()
    return _global_seed


def get_numpy_rng() -> np.random.Generator:
    _ensure()
    return _np_rng


def get_jax_key() -> jax.Array:
    _ensure()
    return _jax_key


def split_jax_key() -> tuple[jax.Array, jax.Array]:
    """Split the global key; advances the global chain."""
    global _jax_key
    _ensure()
    _jax_key, use = jrandom.split(_jax_key)
    return _jax_key, use


def get_new_jax_key() -> jax.Array:
    _, use = split_jax_key()
    return use


def ensure_reproducibility(seed: int | None = None) -> int:
    return set_global_seed(seed)
