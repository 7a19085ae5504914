"""Acquisition-function tests (mirroring reference tests/test_acquisition.py):
EI/LogEI values and consistency, optimization stays in the unit cube, greedy
batch shapes, WIP sweep/refine behavior, MC sample sources."""
import numpy as np
import pytest
import jax.numpy as jnp

from bobe_tpu.acquisition import EI, WIPV, LogEI, WIPStd, get_mc_points, get_mc_samples
from bobe_tpu.models.gp import GP


@pytest.fixture(scope="module")
def gp():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(30, 2))
    y = -10.0 * np.sum((x - 0.6) ** 2, axis=1)
    g = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-6)
    g.fit(n_restarts=2, maxiter=100)
    return g


def test_ei_nonnegative_and_log_consistent(gp):
    ei, logei = EI(), LogEI()
    best_y = float(jnp.max(gp.train_y))
    rng = np.random.default_rng(1)
    for _ in range(5):
        x = jnp.asarray(rng.uniform(size=2))
        v_ei = -float(ei.fun(x, gp, best_y, 0.0))     # fun returns -EI
        v_log = -float(logei.fun(x, gp, best_y, 0.0))  # -logEI
        assert v_ei >= 0.0
        if v_ei > 1e-12:
            assert v_log == pytest.approx(np.log(v_ei), rel=1e-4)


def test_ei_optimization_in_unit_cube(gp):
    x, val = EI().get_next_point(gp, acq_kwargs={}, n_restarts=8, maxiter=100)
    assert x.shape == (2,)
    assert np.all(x >= 0) and np.all(x <= 1)
    assert val >= 0


def test_greedy_batch_shapes(gp):
    pts, vals = LogEI().get_next_batch(gp, n_batch=3, acq_kwargs={},
                                       n_restarts=4, maxiter=50)
    assert pts.shape == (3, 2)
    assert vals.shape == (3,)
    # hallucination should produce distinct points
    assert not np.allclose(pts[0], pts[1])


def test_wip_get_next_point_returns_low_variance_candidate(gp):
    rng = np.random.default_rng(2)
    mc = {"x": rng.uniform(size=(64, 2))}
    for cls in (WIPV, WIPStd):
        x, val = cls().get_next_point(
            gp, acq_kwargs={"mc_samples": mc, "mc_points_size": 32},
            maxiter=50, rng=rng)
        assert x.shape == (2,)
        assert np.all(x >= 0) and np.all(x <= 1)
        assert val > 0


def test_wip_batch_distinct(gp):
    rng = np.random.default_rng(3)
    mc = {"x": rng.uniform(size=(64, 2))}
    pts, vals = WIPStd().get_next_batch(
        gp, n_batch=3, acq_kwargs={"mc_samples": mc, "mc_points_size": 32},
        maxiter=30, rng=rng)
    assert pts.shape == (3, 2)
    d01 = np.linalg.norm(pts[0] - pts[1])
    assert d01 > 1e-4


def test_get_mc_samples_uniform_and_ns(gp):
    u = get_mc_samples(gp, method="uniform", num_samples=128)
    assert u["x"].shape == (128, 2)
    ns = get_mc_samples(gp, method="NS")
    assert ns["method"] == "nested"
    assert ns["x"].shape[1] == 2
    assert np.all((ns["x"] >= 0) & (ns["x"] <= 1))


def test_get_mc_points_subsamples():
    rng = np.random.default_rng(4)
    pool = {"x": rng.uniform(size=(256, 2))}
    pts = get_mc_points(pool, mc_points_size=32, rng=rng)
    assert pts.shape == (32, 2)
    small = {"x": rng.uniform(size=(16, 2))}
    assert get_mc_points(small, mc_points_size=32, rng=rng).shape == (16, 2)
