"""SAAS sparsity prior: the fit should shrink lengthscales of irrelevant
dimensions relative to active ones on a sparse-signal problem."""
import numpy as np
import pytest
import jax.numpy as jnp

from bobe_tpu.models.gp import GP


def test_saas_shrinks_irrelevant_dims():
    rng = np.random.default_rng(0)
    d = 6
    x = rng.uniform(size=(80, d))
    # only dims 0 and 1 matter
    y = np.sin(5 * x[:, 0]) + x[:, 1] ** 2 + 0.02 * rng.normal(size=80)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-4,
            lengthscale_prior="SAAS")
    assert gp.num_hyperparams == d + 1 + 1  # ls + amp + tausq
    gp.fit(n_restarts=4, maxiter=200)
    ls = np.asarray(gp.lengthscales)
    active = ls[:2].mean()
    inactive = ls[2:].mean()
    # inactive dims get (much) longer lengthscales = flatter = shrunk out
    assert inactive > 1.5 * active, (ls, gp.tausq)
    # predictions remain sane
    xq = jnp.asarray(rng.uniform(size=(20, d)))
    mean = gp.predict_mean_batched(xq)
    assert np.all(np.isfinite(np.asarray(mean)))


def test_saas_state_roundtrip(tmp_path):
    import os

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(20, 3))
    y = rng.normal(size=20)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y),
            lengthscale_prior="SAAS", tausq=0.5)
    fn = os.path.join(tmp_path, "saas_gp")
    gp.save(fn)
    gp2 = GP.load(fn)
    assert gp2.cfg.lengthscale_prior == "SAAS"
    assert gp2.tausq == pytest.approx(0.5)
