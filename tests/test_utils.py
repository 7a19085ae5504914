"""Utility-layer tests: seeding, scaling, resampling, KL, thresholds, logging."""
import numpy as np
import pytest

from bobe_tpu.utils import core, seed as seed_mod
from bobe_tpu.utils.log import get_logger, update_verbosity


def test_seed_reproducibility():
    seed_mod.set_global_seed(123)
    a = seed_mod.get_numpy_rng().uniform(size=5)
    k1 = np.asarray(seed_mod.get_new_jax_key())
    seed_mod.set_global_seed(123)
    b = seed_mod.get_numpy_rng().uniform(size=5)
    k2 = np.asarray(seed_mod.get_new_jax_key())
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(k1, k2)
    # key chain advances
    k3 = np.asarray(seed_mod.get_new_jax_key())
    assert not np.array_equal(k2, k3)


def test_seed_validation():
    with pytest.raises(ValueError):
        seed_mod.set_global_seed(-1)


def test_scaling_roundtrip():
    bounds = np.array([[-2.0, 3.0], [0.0, 10.0]]).T
    x = np.random.default_rng(0).uniform(size=(20, 2))
    phys = core.scale_from_unit(x, bounds)
    assert phys[:, 0].min() >= -2 and phys[:, 0].max() <= 3
    np.testing.assert_allclose(core.scale_to_unit(phys, bounds), x, rtol=1e-12)


def test_resample_equal_preserves_mean():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5000, 2))
    w = np.exp(-0.5 * np.sum(x**2, 1))
    xr, _ = core.resample_equal(x, np.zeros(5000), weights=w, rng=rng)
    target = (x * (w / w.sum())[:, None]).sum(0)
    np.testing.assert_allclose(xr.mean(0), target, atol=0.05)


def test_kl_gaussian_zero_for_identical():
    mu = np.array([1.0, 2.0])
    cov = np.array([[1.0, 0.3], [0.3, 2.0]])
    kl = core.kl_divergence_gaussian(mu, cov, mu, cov)
    assert kl["symmetric"] == pytest.approx(0.0, abs=1e-12)


def test_nsigma_threshold_values():
    # 1-sigma in 1d -> delta-chi2/2 = 0.5
    assert core.get_threshold_for_nsigma(1, 1) == pytest.approx(0.5, rel=1e-6)
    # grows with dimension and nsigma
    assert core.get_threshold_for_nsigma(2, 1) > core.get_threshold_for_nsigma(1, 1)
    assert core.get_threshold_for_nsigma(1, 5) > core.get_threshold_for_nsigma(1, 1)


def test_renormalise_log_weights():
    w = core.renormalise_log_weights(np.array([-1e3, -1e3 + np.log(3.0)]))
    np.testing.assert_allclose(w, [0.25, 0.75], rtol=1e-12)


def test_split_vmap_matches_direct():
    import jax.numpy as jnp

    f = lambda x: (x * 2, x + 1)
    xs = jnp.arange(10.0)
    a, b = core.split_vmap(f, (xs,), batch_size=3)
    np.testing.assert_allclose(np.asarray(a), np.arange(10.0) * 2)
    np.testing.assert_allclose(np.asarray(b), np.arange(10.0) + 1)


def test_suppress_stdout():
    import sys

    with core.suppress_stdout_stderr():
        print("this should vanish")
    assert True


def test_logger_levels():
    log = get_logger("testmod")
    update_verbosity("DEBUG")
    assert log.getEffectiveLevel() <= 10
    update_verbosity("INFO")


def test_load_gp_statedict():
    import jax.numpy as jnp

    from bobe_tpu.bo import load_gp_statedict
    from bobe_tpu.models.gp import GP

    rng = np.random.default_rng(2)
    x = rng.uniform(size=(15, 2))
    y = -np.sum(x**2, 1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y))
    gp2 = load_gp_statedict(gp.state_dict(), clf=False)
    assert gp2.npoints == 15
