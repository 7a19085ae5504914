"""GP-facing sampler wrappers: schema and sanity on a trained surrogate."""
import numpy as np
import pytest
import jax.numpy as jnp

from bobe_tpu.models.gp import GP
from bobe_tpu.samplers import get_hmc_settings, nested_sampling, ns_settings, sample_gp_nuts


@pytest.fixture(scope="module")
def gp_gaussian():
    """GP trained on a well-sampled 2-D Gaussian log-density (sigma=0.15)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(120, 2))
    y = -0.5 * np.sum(((x - 0.5) / 0.15) ** 2, axis=1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    gp.fit(n_restarts=4, maxiter=200)
    return gp


def test_settings_defaults():
    assert ns_settings("acq", 2) == (100, 0.1, int(2e6))
    assert ns_settings("convergence", 2) == (500, 0.01, int(5e6))
    assert get_hmc_settings(2) == (256, 1024, 4)
    assert get_hmc_settings(12) == (512, 2048, 4)


def test_nested_sampling_on_gp(gp_gaussian):
    samples, logz_dict, success = nested_sampling(
        gp_gaussian, mode="acq", dlogz=0.1, rng=np.random.default_rng(1))
    assert success
    for k in ("mean", "upper", "lower", "var", "std", "dlogz_sampler"):
        assert k in logz_dict
    assert logz_dict["lower"] <= logz_dict["mean"] <= logz_dict["upper"]
    # analytic logZ of the normalized Gaussian over the unit box:
    # loglike here is the unnormalized quadratic, so
    # logZ = log(2*pi*sigma^2) + log(mass) with sigma=0.15 -> ~log(2pi*0.0225)
    want = np.log(2 * np.pi * 0.15**2)
    assert abs(logz_dict["mean"] - want) < 0.3
    assert samples["method"] == "nested"
    assert samples["x"].shape[1] == 2
    assert np.all(samples["weights"] >= 0)
    # mode='acq' resamples to equal weights (reference samplers.py:119-123)
    assert np.allclose(samples["weights"], 1.0)


def test_sample_gp_nuts_on_gp(gp_gaussian):
    out = sample_gp_nuts(gp_gaussian, num_chains=2, warmup_steps=200,
                         num_samples=600, thinning=2)
    assert out["method"] == "MCMC"
    x = out["x"]
    assert x.shape[1] == 2
    assert np.all((x >= 0) & (x <= 1))
    np.testing.assert_allclose(x.mean(0), [0.5, 0.5], atol=0.08)
    np.testing.assert_allclose(x.std(0), 0.15, atol=0.05)
    assert out["logp"].shape == (x.shape[0],)
    assert out["best"].shape == (2,)
