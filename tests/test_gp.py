"""GP surrogate tests, mirroring the reference's coverage
(/root/reference/tests/test_gp.py): fit improves MLL, prediction shapes and
values, update + dedupe, save/load round-trip, copy independence, kernels
differ — plus padded-buffer invariants unique to this design.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from bobe_tpu.models.gp import GP, _round_capacity


def make_data(n=20, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    y = -np.sum((x - 0.5) ** 2, axis=1) * 10.0
    return jnp.asarray(x), jnp.asarray(y)


@pytest.fixture(scope="module")
def gp20():
    x, y = make_data()
    return GP(train_x=x, train_y=y, noise=1e-8, kernel="rbf")


def test_init_shapes(gp20):
    assert gp20.npoints == 20
    assert gp20.ndim == 2
    assert gp20.state.cap == _round_capacity(20)
    assert gp20.train_x.shape == (20, 2)
    assert gp20.train_y.shape == (20, 1)
    # standardized targets have ~zero mean / unit std
    ys = np.asarray(gp20.train_y)
    np.testing.assert_allclose(ys.mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(ys.std(), 1.0, atol=1e-12)


def test_predictions_at_training_points(gp20):
    """GP with tiny noise interpolates the training data.

    Tolerances account for the adaptive jitter ladder: smooth 2-D data makes
    K near-singular at noise=1e-8, so a relative jitter up to 1e-4*amp may be
    added (ops/chol.cholesky_jittered) — interpolation error ~sqrt(jitter)."""
    mean = gp20.predict_mean_batched(gp20.train_x)
    y_raw = np.asarray(gp20.train_y_raw)
    np.testing.assert_allclose(np.asarray(mean), y_raw, rtol=5e-3, atol=5e-3)
    var = gp20.predict_var_batched(gp20.train_x)
    assert np.all(np.asarray(var) >= 0)
    assert np.all(np.asarray(var) < 1e-2 * float(gp20.y_std) ** 2)


def test_batched_matches_single(gp20):
    xq = jnp.asarray(np.random.default_rng(1).uniform(size=(7, 2)))
    mb = np.asarray(gp20.predict_mean_batched(xq))
    vb = np.asarray(gp20.predict_var_batched(xq))
    for i in range(7):
        np.testing.assert_allclose(float(gp20.predict_mean_single(xq[i])), mb[i], rtol=1e-10)
        np.testing.assert_allclose(float(gp20.predict_var_single(xq[i])), vb[i], rtol=1e-8)


def test_fit_improves_mll():
    x, y = make_data(25, 2, seed=3)
    gp = GP(train_x=x, train_y=y, lengthscales=jnp.asarray([3.0, 0.02]))
    before = float(gp.neg_mll(jnp.log(gp.get_hyperparams())))
    info = gp.fit(n_restarts=4, maxiter=150)
    after = float(gp.neg_mll(jnp.log(gp.get_hyperparams())))
    assert after <= before + 1e-3
    # K is near-singular at noise=1e-8 so the MLL is only determined to
    # ~cond(K)*eps; compare loosely across separately-compiled paths.
    assert info["mll"] == pytest.approx(-after, rel=1e-3, abs=1e-2)


def test_update_extends_and_dedupes():
    x, y = make_data(15, 2, seed=5)
    gp = GP(train_x=x, train_y=y)
    new_x = jnp.asarray([[0.11, 0.22], [0.33, 0.44]])
    new_y = jnp.asarray([-1.0, -2.0])
    gp.update(new_x, new_y)
    assert gp.npoints == 17
    # adding the exact same points again is a no-op
    gp.update(new_x, new_y)
    assert gp.npoints == 17
    # one duplicate + one fresh -> only the fresh point lands
    gp.update(jnp.asarray([[0.11, 0.22], [0.77, 0.88]]), jnp.asarray([-1.0, -3.0]))
    assert gp.npoints == 18
    assert np.allclose(np.asarray(gp.train_x[-1]), [0.77, 0.88])


def test_incremental_update_matches_full_recompute():
    """The block Cholesky extension must agree with a from-scratch factor."""
    x, y = make_data(12, 3, seed=7)
    gp = GP(train_x=x, train_y=y, kernel="matern")
    rng = np.random.default_rng(8)
    for _ in range(3):
        nx = jnp.asarray(rng.uniform(size=(4, 3)))
        ny = jnp.asarray(rng.normal(size=4))
        gp.update(nx, ny)
    n = gp.npoints
    L_inc = np.asarray(gp.state.chol)[:n, :n]
    gp2 = GP(train_x=gp.train_x, train_y=gp.train_y_raw, kernel="matern",
             lengthscales=gp.lengthscales, kernel_variance=gp.kernel_variance)
    L_full = np.asarray(gp2.state.chol)[:n, :n]
    np.testing.assert_allclose(L_inc, L_full, rtol=1e-7, atol=1e-10)
    # predictions agree too
    xq = jnp.asarray(rng.uniform(size=(5, 3)))
    np.testing.assert_allclose(np.asarray(gp.predict_mean_batched(xq)),
                               np.asarray(gp2.predict_mean_batched(xq)), rtol=1e-7)


def test_capacity_growth():
    x, y = make_data(10, 2, seed=9)
    gp = GP(train_x=x, train_y=y)
    cap0 = gp.state.cap
    rng = np.random.default_rng(10)
    gp.update(jnp.asarray(rng.uniform(size=(cap0 - 10 + 1, 2))),
              jnp.asarray(rng.normal(size=cap0 - 10 + 1)))
    assert gp.state.cap > cap0
    assert gp.npoints == cap0 + 1
    # grown state stays numerically healthy (the appended targets are random
    # noise, so exact interpolation is not expected at noise=1e-8)
    mean = gp.predict_mean_batched(gp.train_x[:5])
    var = gp.predict_var_batched(gp.train_x[:5])
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) >= 0)


def test_random_point_in_unit_cube(gp20):
    for _ in range(5):
        pt = gp20.get_random_point()
        assert pt.shape == (2,)
        assert np.all(pt >= 0) and np.all(pt <= 1)


def test_state_dict_save_load_roundtrip(tmp_path, gp20):
    fn = os.path.join(tmp_path, "gp_test")
    gp20.save(fn)
    gp2 = GP.load(fn)
    assert gp2.npoints == gp20.npoints
    xq = jnp.asarray(np.random.default_rng(2).uniform(size=(9, 2)))
    np.testing.assert_allclose(np.asarray(gp20.predict_mean_batched(xq)),
                               np.asarray(gp2.predict_mean_batched(xq)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp20.predict_var_batched(xq)),
                               np.asarray(gp2.predict_var_batched(xq)), rtol=1e-6)


def test_copy_independent(gp20):
    gp2 = gp20.copy()
    n0 = gp20.npoints
    gp2.update(jnp.asarray([[0.9, 0.9]]), jnp.asarray([-5.0]))
    assert gp2.npoints == n0 + 1
    assert gp20.npoints == n0


def test_kernels_differ():
    x, y = make_data(15, 2, seed=11)
    gp_rbf = GP(train_x=x, train_y=y, kernel="rbf")
    gp_mat = GP(train_x=x, train_y=y, kernel="matern")
    xq = jnp.asarray([[0.42, 0.77]])
    assert not np.allclose(np.asarray(gp_rbf.predict_var_batched(xq)),
                           np.asarray(gp_mat.predict_var_batched(xq)))


def test_fantasy_var_reduces_variance(gp20):
    rng = np.random.default_rng(12)
    mc = jnp.asarray(rng.uniform(size=(8, 2)))
    xnew = jnp.asarray([0.5, 0.5])
    fv = np.asarray(gp20.fantasy_var(xnew, mc))
    v0 = np.asarray(gp20.predict_var_batched(mc))
    assert fv.shape == (8,)
    assert np.all(fv <= v0 + 1e-12)


def test_dslp_prior_and_saas_parse():
    x, y = make_data(12, 2, seed=13)
    gp = GP(train_x=x, train_y=y, lengthscale_prior="DSLP")
    v = float(gp.neg_mll(jnp.log(gp.get_hyperparams())))
    assert np.isfinite(v)
    gp_saas = GP(train_x=x, train_y=y, lengthscale_prior="SAAS")
    assert gp_saas.num_hyperparams == 2 + 1 + 1  # d lengthscales + amp + tausq
    v2 = float(gp_saas.neg_mll(jnp.log(gp_saas.get_hyperparams())))
    assert np.isfinite(v2)


def test_fixed_kernel_variance():
    x, y = make_data(12, 2, seed=14)
    gp = GP(train_x=x, train_y=y, kernel_variance=2.5,
            kernel_variance_prior="fixed")
    assert gp.num_hyperparams == 2
    gp.fit(n_restarts=2, maxiter=50)
    assert gp.kernel_variance == pytest.approx(2.5)


def test_extend_duplicate_and_epsilon_close_batches_stay_finite():
    """Within-batch dedupe + the NaN-fallback-to-refresh safety net: updating
    with exact-duplicate and epsilon-close batches must leave a finite state
    whose predictions match a from-scratch rebuild."""
    x, y = make_data(14, 2, seed=21)
    gp = GP(train_x=x, train_y=y)
    # batch with an exact internal duplicate -> only one lands
    gp.update(jnp.asarray([[0.21, 0.31], [0.21, 0.31]]), jnp.asarray([-1.5, -1.5]))
    assert gp.npoints == 15
    # batch with two members inside the dedupe tolerance of each other
    eps = 1e-8
    gp.update(jnp.asarray([[0.61, 0.71], [0.61 + eps, 0.71 - eps]]),
              jnp.asarray([-2.5, -2.5]))
    assert gp.npoints == 16
    # batch with members just OUTSIDE the dedupe tolerance (atol 1e-6 +
    # rtol 1e-4: ~4e-5 at x=0.41) -> ill-conditioned but both must land finite
    sep = 2e-4
    gp.update(jnp.asarray([[0.41, 0.81], [0.41 + sep, 0.81]]),
              jnp.asarray([-3.0, -3.0001]))
    assert gp.npoints == 18
    assert np.all(np.isfinite(np.asarray(gp.state.chol)))
    assert np.all(np.isfinite(np.asarray(gp.state.alpha)))
    # predictions agree with a from-scratch rebuild of the same data
    gp2 = GP(train_x=gp.train_x, train_y=gp.train_y_raw,
             lengthscales=gp.lengthscales, kernel_variance=gp.kernel_variance)
    xq = jnp.asarray(np.random.default_rng(22).uniform(size=(6, 2)))
    np.testing.assert_allclose(np.asarray(gp.predict_mean_batched(xq)),
                               np.asarray(gp2.predict_mean_batched(xq)),
                               rtol=1e-5, atol=1e-8)
    v1 = np.asarray(gp.predict_var_batched(xq))
    v2 = np.asarray(gp2.predict_var_batched(xq))
    np.testing.assert_allclose(v1, v2, rtol=1e-3, atol=1e-8)


def test_extend_nan_factor_falls_back_to_refresh():
    """If the incremental block extension produces a non-finite factor, extend
    must fall back to a full jitter-laddered refresh: a poisoned Cholesky
    buffer heals on the next update instead of silently propagating NaN."""
    import jax.numpy as jnp2

    from bobe_tpu.models.gp import extend

    x, y = make_data(10, 2, seed=31)
    gp = GP(train_x=x, train_y=y)
    bad = gp.state._replace(chol=gp.state.chol.at[0, 0].set(jnp2.nan))
    new_x = jnp.asarray([[0.91, 0.13]])
    new_y = jnp.asarray([-4.0])
    healed = extend(bad, gp.cfg, new_x, new_y)
    assert int(healed.n) == 11
    assert np.all(np.isfinite(np.asarray(healed.chol)))
    assert np.all(np.isfinite(np.asarray(healed.alpha)))
    # and the healed state predicts like a clean from-scratch build
    gp.update(new_x, new_y)
    xq = jnp.asarray(np.random.default_rng(32).uniform(size=(5, 2)))
    from bobe_tpu.models.gp import predict_mean
    np.testing.assert_allclose(np.asarray(predict_mean(healed, gp.cfg, xq)),
                               np.asarray(gp.predict_mean_batched(xq)),
                               rtol=1e-6, atol=1e-9)


def test_host_mirror_tracks_device_state():
    """The host (x, y) mirror must stay bit-equal to the device active rows
    through updates with duplicates (same dedupe replica), so host-routed
    f64 fits (models/gp._fit_f64_host) see exactly the device data."""
    x, y = make_data(12, 3, seed=7)
    gp = GP(train_x=x, train_y=y)
    rng = np.random.default_rng(8)
    for _ in range(4):
        b = rng.integers(1, 5)
        nx = rng.uniform(size=(b, 3))
        ny = -np.sum((nx - 0.4) ** 2, axis=1)
        # inject an exact duplicate of an existing point and a batch-internal
        # duplicate to exercise both dedupe branches
        nx = np.vstack([nx, gp._host_x[0], nx[0]])
        ny = np.concatenate([ny, [gp._host_y[0]], [ny[0]]])
        gp.update(nx, ny)
        mirror = gp._host_mirror()
        assert mirror is not None
        mx, my = mirror
        n = int(gp.state.n)
        assert len(my) == n
        np.testing.assert_array_equal(mx, np.asarray(gp.state.x)[:n])
        np.testing.assert_array_equal(my, np.asarray(gp.state.y_raw)[:n])
    # a direct state mutation desynchronizes -> mirror reports None
    gp.state = gp.state._replace(n=gp.state.n + 1)
    assert gp._host_mirror() is None


def test_host_routed_fit_matches_device_fit(monkeypatch):
    """_fit_f64_host (lockstep method) with the mirror must select the same
    hyperparameters as the on-device f64 fit (identical objective and
    optimizer, identical x0)."""
    from bobe_tpu.models import gp as gpm

    monkeypatch.setenv("BOBE_TPU_HOST_FIT_METHOD", "lockstep")
    x, y = make_data(40, 2, seed=9)
    gp = GP(train_x=x, train_y=y)
    bounds = gpm.hyperparam_bounds_log(gp.cfg, 2)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(np.asarray(bounds[0]), np.asarray(bounds[1]),
                                 size=(4, bounds.shape[1])))
    best_host, f_host, _, _ = gpm._fit_f64_host(
        gp.state, gp.cfg, 2, 200, "lbfgs", x0,
        host_xy=gp._host_mirror())
    best_fetch, f_fetch, _, _ = gpm._fit_f64_host(
        gp.state, gp.cfg, 2, 200, "lbfgs", x0, host_xy=None)
    run = gpm._fit_core(gp.cfg, 2, 200, "lbfgs", fit_dtype="float64")
    _, best_dev, f_dev = run(gp.state, x0)
    # fetch path reuses the device y_mean/y_std -> bit-identical objective
    np.testing.assert_allclose(best_fetch, np.asarray(best_dev), rtol=1e-10)
    # mirror path recomputes the standardization host-side: the objective
    # differs in the last ulp (summation order), so L-BFGS lands ulp-
    # differently in the same basin — selection-equivalent, not bit-equal
    np.testing.assert_allclose(best_host, np.asarray(best_dev), rtol=5e-3)
    assert abs(f_host - float(f_dev)) < 1e-3 * abs(float(f_dev))


def test_host_scipy_fit_not_worse_than_lockstep():
    """The default host fit method (scipy L-BFGS-B, adaptive line search)
    must reach an equal-or-better f64 neg-MLL optimum than the lockstep loop
    from the same restarts, and its endpoint must score identically under
    the shared neg_mll objective (the objective cannot drift — only the
    descent strategy differs)."""
    from bobe_tpu.models import gp as gpm

    x, y = make_data(40, 2, seed=9)
    gp = GP(train_x=x, train_y=y)
    bounds = gpm.hyperparam_bounds_log(gp.cfg, 2)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(np.asarray(bounds[0]), np.asarray(bounds[1]),
                                 size=(4, bounds.shape[1])))
    assert os.environ.get("BOBE_TPU_HOST_FIT_METHOD") is None  # default=scipy
    # host_xy=None (fetch path): the host state reuses the device y_mean /
    # y_std bit-exactly, so the value-identity check below is exact; the
    # mirror path differs in the last ulp of the standardization
    best_sp, f_sp, _, _ = gpm._fit_f64_host(gp.state, gp.cfg, 2, 200, "lbfgs", x0,
                                      host_xy=None)
    run = gpm._fit_core(gp.cfg, 2, 200, "lbfgs", fit_dtype="float64")
    _, best_dev, f_dev = run(gp.state, x0)
    # the reported optimum must BE the objective value at the returned point
    f_check = float(gpm.neg_mll(gpm._cast_state(gp.state, jnp.float64),
                                gp.cfg, jnp.asarray(best_sp)))
    assert abs(f_check - f_sp) < 1e-6 * max(1.0, abs(f_sp))
    # same-basin-or-better optimum: the two descents may stop a sub-nat
    # apart within one basin (adaptive zoom vs fixed-trip backtracking), but
    # scipy must never fall back to a screened initial point or a strictly
    # worse basin (the acceptance-filter bug this test was written against
    # returned +45.8 here, 225 nats worse)
    assert f_sp <= float(f_dev) + 1e-3 * max(1.0, abs(float(f_dev)))
    # in-bounds endpoint
    b = np.asarray(bounds)
    assert np.all(best_sp >= b[0] - 1e-12) and np.all(best_sp <= b[1] + 1e-12)


def test_host_routed_refresh_matches_device_refresh():
    """_refresh_via_host must produce the same state as the on-device
    set_hyperparams (same f64 graph, host-built from the mirror)."""
    from bobe_tpu.models import gp as gpm

    for warp in (False, True):
        x, y = make_data(30, 2, seed=11)
        gp = GP(train_x=x, train_y=y, input_warp=warp)
        bounds = gpm.hyperparam_bounds_log(gp.cfg, 2)
        rng = np.random.default_rng(3)
        lp = rng.uniform(np.asarray(bounds[0]), np.asarray(bounds[1]))
        dev = gpm.set_hyperparams(gp.state, gp.cfg, jnp.asarray(lp))
        host = gpm._refresh_via_host(gp.state, gp.cfg, 2, lp,
                                     gp._host_mirror())
        for leaf in ("chol", "alpha", "log_ls", "log_amp", "log_tausq",
                     "y_mean", "y_std"):
            np.testing.assert_allclose(
                np.asarray(getattr(host, leaf)),
                np.asarray(getattr(dev, leaf)), rtol=1e-12, atol=1e-12,
                err_msg=f"{leaf} (warp={warp})")
        if warp:
            np.testing.assert_allclose(np.asarray(host.log_wa),
                                       np.asarray(dev.log_wa), rtol=1e-12)
            np.testing.assert_allclose(np.asarray(host.log_wb),
                                       np.asarray(dev.log_wb), rtol=1e-12)


def test_fit_with_forced_host_routing_matches(monkeypatch):
    """fit() with host routing forced on (the TPU production path) must land
    on the same hyperparameters and refreshed state as the device path.
    Pinned to the lockstep host method: the point is ROUTING equivalence
    (same optimizer, host vs device), and the default scipy method is a
    deliberately different descent (see
    test_host_scipy_fit_not_worse_than_lockstep — on this very landscape it
    escapes the bound-pinned basin the lockstep path stops in)."""
    from bobe_tpu.models import gp as gpm

    monkeypatch.setenv("BOBE_TPU_HOST_FIT_METHOD", "lockstep")
    x, y = make_data(40, 2, seed=13)
    rng_a, rng_b = np.random.default_rng(5), np.random.default_rng(5)
    gp_a = GP(train_x=x, train_y=y)
    gp_b = GP(train_x=x, train_y=y)
    st_dev, info_dev = gpm.fit(gp_a.state, gp_a.cfg, maxiter=100,
                               n_restarts=2, rng=rng_a,
                               host_xy=gp_a._host_mirror())
    monkeypatch.setattr(gpm, "_route_f64_to_host", lambda: True)
    st_host, info_host = gpm.fit(gp_b.state, gp_b.cfg, maxiter=100,
                                 n_restarts=2, rng=rng_b,
                                 host_xy=gp_b._host_mirror())
    # on the CPU test platform "host" and "device" are the same backend up to
    # the mirror-rebuilt standardization (last-ulp summation order): the fits
    # must land in the same basin with matching refreshed predictions
    np.testing.assert_allclose(np.asarray(info_host["params"]),
                               np.asarray(info_dev["params"]), rtol=5e-3)
    xq = jnp.asarray(np.random.default_rng(6).uniform(size=(7, 2)))
    np.testing.assert_allclose(
        np.asarray(gpm.predict_mean(st_host, gp_b.cfg, xq)),
        np.asarray(gpm.predict_mean(st_dev, gp_a.cfg, xq)),
        rtol=1e-5, atol=1e-8)


def test_loo_calibration_detects_overconfidence():
    """RMS LOO z-score ~ 1 for a well-specified fit; >> 1 when the model is
    over-confident (mis-specified smoothness with near-zero noise)."""
    from bobe_tpu.models.gp import _loo_z_rms

    rng = np.random.default_rng(4)
    x = rng.uniform(size=(80, 2))
    y = np.sin(4 * x[:, 0]) * np.cos(3 * x[:, 1])
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y))
    gp.fit(n_restarts=4, maxiter=200, rng=rng)
    kappa_fit = gp.loo_z_rms()
    assert 0.2 < kappa_fit < 3.0, kappa_fit

    # mis-specified: force lengthscales far too long -> residuals dwarf the
    # (tiny-noise) predicted LOO sd
    gp_bad = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y),
                lengthscales=np.full(2, 4.0))
    kappa_bad = float(_loo_z_rms(gp_bad.state))
    assert kappa_bad > 5.0, kappa_bad


def test_chunked_batched_predict_matches_unchunked(monkeypatch):
    """Unbounded predict batches (NS sigma-bound integrals over every dead
    point) are split into fixed-size device calls with a padded tail —
    results must be exactly the unchunked ones. Regression for the HBM OOM
    at cap=2048, d=30, m=142800 (28.3 GB requested on a 16 GB v5e)."""
    import numpy as np

    import jax.numpy as jnp

    from bobe_tpu.models.gp import GP

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(40, 3))
    y = -np.sum(((x - 0.5) / 0.3) ** 2, axis=1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    xq = jnp.asarray(rng.uniform(size=(103, 3)))  # not a multiple of chunk

    ref_mean = np.asarray(gp.predict_mean_batched(xq))
    ref_var = np.asarray(gp.predict_var_batched(xq))
    ref_mv = tuple(np.asarray(a) for a in gp.predict_batched(xq))

    monkeypatch.setenv("BOBE_TPU_PREDICT_CHUNK", "16")
    np.testing.assert_array_equal(np.asarray(gp.predict_mean_batched(xq)), ref_mean)
    np.testing.assert_array_equal(np.asarray(gp.predict_var_batched(xq)), ref_var)
    mv = gp.predict_batched(xq)
    np.testing.assert_array_equal(np.asarray(mv[0]), ref_mv[0])
    np.testing.assert_array_equal(np.asarray(mv[1]), ref_mv[1])


def test_chunked_predict_matches_on_clf_gp(monkeypatch):
    from bobe_tpu.models.clf_gp import GPwithClassifier

    import numpy as np

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(40, 2))
    y = -np.sum(((x - 0.5) / 0.2) ** 2, axis=1) * 30
    gp = GPwithClassifier(train_x=x, train_y=y, clf_type="svm",
                          clf_use_size=10, noise=1e-8)
    gp.train_classifier()
    xq = jnp.asarray(rng.uniform(size=(77, 2)))
    ref = tuple(np.asarray(a) for a in gp.predict_batched(xq))
    monkeypatch.setenv("BOBE_TPU_PREDICT_CHUNK", "16")
    out = gp.predict_batched(xq)
    np.testing.assert_array_equal(np.asarray(out[0]), ref[0])
    np.testing.assert_array_equal(np.asarray(out[1]), ref[1])


def test_param_names_survive_state_roundtrip(tmp_path):
    """Custom parameter names must survive copy/save/load — resumed runs
    used to silently reset lengthscale logging keys to x_0..x_{d-1}."""
    import numpy as np

    import jax.numpy as jnp

    from bobe_tpu.models.gp import GP

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(12, 2))
    y = -np.sum((x - 0.5) ** 2, axis=1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8,
            param_names=["omega_m", "h0"])
    assert gp.copy().param_names == ["omega_m", "h0"]
    path = str(tmp_path / "named.npz")
    gp.save(path)
    assert GP.load(path).param_names == ["omega_m", "h0"]
    assert "omega_m" in gp.hyperparams_dict()["lengthscales"]


def test_unknown_kernel_name_raises():
    """A typo'd kernel must not silently become a different covariance
    family (the old coercion mapped anything != 'rbf' to matern)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(8, 2))
    y = -np.sum((x - 0.5) ** 2, axis=1)
    with pytest.raises(ValueError, match="Unknown kernel"):
        GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), kernel="rbf ")
    # matern52 is an accepted alias of matern
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), kernel="matern52")
    assert gp.cfg.kernel == "matern"


def test_optimizer_options_are_honored(monkeypatch):
    """Constructor optimizer_options must reach the fit (reference
    gp.py:421-430 forwards them); they were stored + persisted but ignored."""
    from bobe_tpu.models import gp as gpm

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(12, 2))
    y = -np.sum((x - 0.5) ** 2, axis=1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y),
            optimizer_options={"maxiter": 7, "n_restarts": 2})
    seen = {}
    orig = gpm.fit

    def spy(state, cfg, **kw):
        seen.update(kw)
        return orig(state, cfg, **kw)

    monkeypatch.setattr(gpm, "fit", spy)
    gp.fit(maxiter=500, n_restarts=4)
    assert seen["maxiter"] == 7
    assert seen["n_restarts"] == 2


def test_fit_returns_basins_best_first():
    """fit() reports the distinct optimizer basins of the restart endpoints
    (best-first, basin 0 = the installed optimum) and the facade caches
    them for the evidence bounds (dlogz_hyp, samplers.py)."""
    from bobe_tpu.models import gp as gpm

    x, y = make_data(40, 2, seed=9)
    gp = GP(train_x=x, train_y=y)
    info = gp.fit(n_restarts=4, maxiter=100)
    basins = info["basins"]
    assert len(basins) >= 1
    np.testing.assert_allclose(basins[0][0], info["params"], atol=1e-12)
    fs = [b[1] for b in basins]
    assert fs == sorted(fs)
    assert len(gp.hyp_basins()) >= 1
    # window: a basin 100 nats worse must be trimmed from hyp_basins
    gp._fit_basins = list(basins) + [(basins[0][0] + 1.0,
                                      basins[0][1] + 100.0)]
    kept = gp.hyp_basins()
    assert all(f - kept[0][1] <= 8.0 for _, f in kept)


def test_endpoint_basins_dedupe_and_sort():
    from bobe_tpu.models.gp import _endpoint_basins

    xs = np.array([[0.0, 0.0], [0.001, -0.001], [2.0, 2.0]])
    fs = np.array([5.0, 4.9, 7.0])
    basins = _endpoint_basins(xs, fs)
    assert len(basins) == 2  # first two endpoints share one basin
    assert basins[0][1] == 4.9 and basins[1][1] == 7.0
    assert _endpoint_basins(np.zeros((0, 2)), np.zeros((0,))) == []


def test_predict_mean_with_params_matches_current_at_same_params():
    x, y = make_data(40, 2, seed=9)
    gp = GP(train_x=x, train_y=y)
    gp.fit(n_restarts=2, maxiter=60)
    params = np.log(np.asarray(gp.get_hyperparams()))
    q = np.random.default_rng(0).uniform(size=(7, 2))
    np.testing.assert_allclose(
        np.asarray(gp.predict_mean_with_params(params, q)),
        np.asarray(gp.predict_mean_batched(jnp.asarray(q))), rtol=1e-8)
    # and ALTERNATE params actually change the prediction
    alt = params + np.array([1.0] * (len(params) - 1) + [0.0])
    diff = np.abs(np.asarray(gp.predict_mean_with_params(alt, q))
                  - np.asarray(gp.predict_mean_batched(jnp.asarray(q))))
    assert diff.max() > 1e-6


def test_fit_basins_roundtrip_state_dict(tmp_path):
    x, y = make_data(40, 2, seed=9)
    gp = GP(train_x=x, train_y=y)
    gp.fit(n_restarts=3, maxiter=60)
    gp._fit_basins = [(np.array([0.1, 0.2, 0.3]), -5.0),
                      (np.array([1.1, 1.2, 1.3]), -4.0)]
    gp2 = GP.from_state_dict(gp.state_dict())
    assert len(gp2.hyp_basins()) == 2
    np.testing.assert_allclose(gp2._fit_basins[0][0], [0.1, 0.2, 0.3])
    assert gp2._fit_basins[1][1] == -4.0
    # npz save/load path too
    gp.save(str(tmp_path / "g"))
    gp3 = GP.load(str(tmp_path / "g"))
    assert len(gp3.hyp_basins()) == 2
    # absent keys (reference-era dicts) leave basins empty
    sd = gp.state_dict()
    sd.pop("fit_basins_params"), sd.pop("fit_basins_nmll")
    assert GP.from_state_dict(sd).hyp_basins() == []
