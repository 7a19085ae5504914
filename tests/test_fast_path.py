"""f32 fast-path consistency: reduced-precision fit/sweep must agree with the
f64 reference path on hyperparameter selection and candidate ranking."""
import numpy as np
import pytest
import jax.numpy as jnp

from bobe_tpu.acquisition import _wip_sweep_core
from bobe_tpu.models import gp as gpm


@pytest.fixture(scope="module")
def gp40():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(40, 3))
    y = -0.5 * np.sum(((x - 0.5) / 0.25) ** 2, axis=1)
    return gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)


def test_f32_fit_selects_similar_hyperparams(gp40):
    x0 = jnp.log(gp40.get_hyperparams())[None, :]
    x0 = jnp.vstack([x0, x0 + 0.5, x0 - 0.5])
    run64 = gpm._fit_core(gp40.cfg, 3, 100, "lbfgs", "float64")
    run32 = gpm._fit_core(gp40.cfg, 3, 100, "lbfgs", "float32")
    st64, best64, f64_ = run64(gp40.state, x0)
    st32, best32, f32_ = run32(gp40.state, x0)
    # the selected optimum should agree to ~1e-2 in log-hyperparam space
    np.testing.assert_allclose(np.asarray(best32), np.asarray(best64),
                               atol=5e-2)
    # and the refreshed f64 states predict nearly identically
    xq = jnp.asarray(np.random.default_rng(1).uniform(size=(10, 3)))
    m64 = gpm.predict_mean(st64, gp40.cfg, xq)
    m32 = gpm.predict_mean(st32, gp40.cfg, xq)
    np.testing.assert_allclose(np.asarray(m32), np.asarray(m64),
                               rtol=1e-3, atol=1e-3)


def test_f32_sweep_ranks_candidates_like_f64(gp40):
    mc = jnp.asarray(np.random.default_rng(2).uniform(size=(32, 3)))
    acq64, _, _ = _wip_sweep_core(gp40.cfg, True, "float64")(gp40.state, mc)
    acq32, _, _ = _wip_sweep_core(gp40.cfg, True, "float32")(gp40.state, mc)
    assert acq32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(acq32), np.asarray(acq64),
                               rtol=1e-3)
    assert int(jnp.argmin(acq32)) == int(jnp.argmin(acq64))
