"""Pallas fused-Gram kernel vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bobe_tpu.ops import kernels as kr
from bobe_tpu.ops.pallas_gram import gram_masked_pallas


@pytest.mark.parametrize("name", ["rbf", "matern"])
def test_pallas_gram_matches_xla(name):
    rng = np.random.default_rng(0)
    cap, d, n = 256, 4, 100
    x = jnp.asarray(rng.uniform(size=(cap, d)))
    mask = (jnp.arange(cap) < n).astype(jnp.float64)
    ls = jnp.asarray([0.3, 0.8, 1.2, 0.5])
    amp, noise = 2.0, 1e-4

    want = np.asarray(kr.gram_masked(name, x, mask, ls, amp, noise),
                      dtype=np.float32)
    got = np.asarray(gram_masked_pallas(name, x, mask, ls, amp, noise,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # pad block identity
    np.testing.assert_allclose(got[n:, n:], np.eye(cap - n), atol=2e-6)


def test_gram_masked_dispatches_to_pallas(monkeypatch):
    """Production wiring: with BOBE_TPU_PALLAS_GRAM the padded Gram builder
    routes eligible f32 builds through the fused Pallas kernel (interpret
    mode off-TPU) and matches the XLA build."""
    monkeypatch.setattr(kr, "_PALLAS_GRAM", True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(128, 4)), dtype=jnp.float32)
    mask = jnp.asarray((np.arange(128) < 100).astype(np.float32))
    ls = jnp.asarray(np.full(4, 0.4), dtype=jnp.float32)
    got = np.asarray(kr.gram_masked("rbf", x, mask, ls,
                                    jnp.float32(1.5), jnp.float32(1e-6)))
    monkeypatch.setattr(kr, "_PALLAS_GRAM", False)
    want = np.asarray(kr.gram_masked("rbf", x, mask, ls,
                                     jnp.float32(1.5), jnp.float32(1e-6)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
