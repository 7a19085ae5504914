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


def test_saas_convergence_high_d():
    """High-d SAAS fit (d=16, 3 active dims): the sparsity prior must still
    converge to a finite optimum and rank ALL active dims shorter than the
    inactive median (round-1 noted gap: no high-d SAAS convergence test)."""
    rng = np.random.default_rng(7)
    d, n = 16, 120
    x = rng.uniform(size=(n, d))
    y = (np.sin(6 * x[:, 0]) + 2.0 * (x[:, 5] - 0.5) ** 2
         - 1.5 * x[:, 11] + 0.02 * rng.normal(size=n))
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-4,
            lengthscale_prior="SAAS")
    info = gp.fit(n_restarts=4, maxiter=300)
    assert np.isfinite(info["mll"])
    ls = np.asarray(gp.lengthscales)
    active = ls[[0, 5, 11]]
    inactive = np.delete(ls, [0, 5, 11])
    assert np.all(np.isfinite(ls)) and np.all(ls > 0)
    assert np.max(active) < np.median(inactive), (active, np.median(inactive))
    # out-of-sample predictive sanity at high d
    xq = rng.uniform(size=(200, d))
    yq = (np.sin(6 * xq[:, 0]) + 2.0 * (xq[:, 5] - 0.5) ** 2 - 1.5 * xq[:, 11])
    mean = np.asarray(gp.predict_mean_batched(jnp.asarray(xq)))
    rmse = float(np.sqrt(np.mean((mean - yq) ** 2)))
    assert rmse < 0.5 * float(np.std(yq)), rmse
