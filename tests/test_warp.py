"""Kumaraswamy input warping (beyond-reference capability).

The reference GP is strictly stationary (/root/reference/BOBE/gp.py:124-168
— RBF/Matérn on raw unit-cube coordinates). `input_warp=True` fits a
per-dimension monotone CDF warp jointly with the kernel hyperparameters,
targeting posteriors whose lengthscale varies across the cube (the d=30
bound-tightening lead, NOTES_ROUND3). Default off: the stationary path must
remain bit-identical.
"""
import jax.numpy as jnp
import numpy as np

from bobe_tpu.models import gp as gpm


def _data(n=60, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    y = -0.5 * np.sum(((x - 0.5) / 0.25) ** 2, axis=1)
    return x, y


def _warped_data(n=80, seed=1, a=2.5, b=0.6):
    """1-d function that is smooth in u = 1-(1-x^a)^b but compressed near
    x=0 in raw coordinates — a stationary kernel needs a very short global
    lengthscale; a warped kernel does not."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, 1))
    u = 1.0 - (1.0 - x[:, 0] ** a) ** b
    y = np.sin(6.0 * u) + 0.5 * u
    return x, y


def test_identity_warp_matches_stationary():
    x, y = _data()
    gp0 = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    gp1 = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8,
                 input_warp=True)
    xq = jnp.asarray(np.random.default_rng(3).uniform(0.05, 0.95,
                                                      size=(15, 2)))
    m0, v0 = gpm.predict(gp0.state, gp0.cfg, xq)
    m1, v1 = gpm.predict(gp1.state, gp1.cfg, xq)
    # a = b = 1 -> u = 1-(1-x) = x up to one rounding of (1-x): the warp
    # perturbs coordinates by O(eps), so predictions agree to ~1e-12 but not
    # bitwise
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6,
                               atol=1e-12)


def test_warp_bounds_and_param_packing():
    d = 3
    cfg = gpm.GPTrainConfig(input_warp=True)
    b = gpm.hyperparam_bounds_log(cfg, d)
    assert b.shape == (2, d + 1 + 2 * d)  # ls(d) + amp + wa(d) + wb(d)
    cfg_saas = gpm.GPTrainConfig(input_warp=True, lengthscale_prior="SAAS")
    assert gpm.hyperparam_bounds_log(cfg_saas, d).shape == (2, 2 + 3 * d)

    x, y = _data(d=d)
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y),
                input_warp=True)
    assert gp.get_hyperparams().shape == (d + 1 + 2 * d,)
    # set_hyperparams stores the trailing warp block in the state
    lp = jnp.concatenate([jnp.zeros(d + 1),
                          jnp.full((d,), 0.3), jnp.full((d,), -0.2)])
    st = gpm.set_hyperparams(gp.state, gp.cfg, lp)
    np.testing.assert_allclose(np.asarray(st.log_wa), 0.3, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.log_wb), -0.2, rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(st.chol)))


def test_fit_recovers_warped_function():
    """On data smooth only in warp space, the warped fit must reach a
    materially better exact MLL than the stationary fit and move the warp
    away from identity."""
    x, y = _warped_data()
    kw = dict(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-6)
    gp0 = gpm.GP(**kw)
    gp1 = gpm.GP(**kw, input_warp=True)
    rng0, rng1 = np.random.default_rng(7), np.random.default_rng(7)
    _, info0 = gpm.fit(gp0.state, gp0.cfg, maxiter=150, n_restarts=3,
                       rng=rng0)
    st1, info1 = gpm.fit(gp1.state, gp1.cfg, maxiter=150, n_restarts=3,
                         rng=rng1)
    assert info1["mll"] > info0["mll"] + 2.0, (info0["mll"], info1["mll"])
    warp_move = float(jnp.max(jnp.abs(st1.log_wa)) +
                      jnp.max(jnp.abs(st1.log_wb)))
    assert warp_move > 0.05


def test_warp_state_dict_roundtrip():
    x, y = _warped_data(n=40)
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-6,
                input_warp=True)
    gp.state, _ = gpm.fit(gp.state, gp.cfg, maxiter=60, n_restarts=2,
                          rng=np.random.default_rng(5))
    gp2 = gpm.GP.from_state_dict(gp.state_dict())
    assert gp2.cfg.input_warp
    np.testing.assert_allclose(np.asarray(gp2.state.log_wa),
                               np.asarray(gp.state.log_wa), rtol=1e-10)
    xq = jnp.asarray(np.random.default_rng(9).uniform(0.1, 0.9, (12, 1)))
    m1, v1 = gpm.predict(gp.state, gp.cfg, xq)
    m2, v2 = gpm.predict(gp2.state, gp2.cfg, xq)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-6)


def test_warp_on_f32_fit_path(monkeypatch):
    """The TPU-style fit pipeline (f32 descent + exact-f64 endpoint
    selection + f64 polish) must compose with the warp-extended
    hyperparameter vector and report the exact f64 MLL."""
    from bobe_tpu import config

    monkeypatch.setattr(config, "_COMPUTE_DTYPE", jnp.float32)
    monkeypatch.setenv("BOBE_TPU_F64_FIT_MAX_CAP", "0")
    x, y = _warped_data(n=70)
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-6,
                input_warp=True)
    st, info = gpm.fit(gp.state, gp.cfg, maxiter=80, n_restarts=3,
                       rng=np.random.default_rng(2))
    exact = float(gpm.neg_mll(gp.state, gp.cfg, jnp.asarray(info["params"])))
    np.testing.assert_allclose(info["mll"], -exact, rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(st.chol)))


def test_saas_prior_composes_with_warp():
    """SAAS packs tausq between amp and the warp block — the full fit must
    parse the 11-entry vector (ls 3 + amp + tausq + wa 3 + wb 3) correctly."""
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(50, 3))
    y = -np.sum(((x - 0.5) / 0.3) ** 2, 1)
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-6,
                lengthscale_prior="SAAS", input_warp=True)
    st, info = gpm.fit(gp.state, gp.cfg, maxiter=60, n_restarts=2,
                       rng=np.random.default_rng(3))
    assert len(info["params"]) == 3 + 1 + 1 + 6
    assert np.isfinite(info["mll"])
    assert np.all(np.isfinite(np.asarray(st.chol)))
    # round-trip: the state's unpacked params match the packed vector
    np.testing.assert_allclose(np.asarray(st.log_ls), info["params"][:3],
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st.log_wa), info["params"][5:8],
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st.log_wb), info["params"][8:11],
                               rtol=1e-10)


def test_warp_npz_save_load_roundtrip(tmp_path):
    """GP.save/GP.load (npz, the crash-recovery/resume format) must carry
    the warp config and parameters."""
    x, y = _warped_data(n=40)
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-6,
                input_warp=True)
    lp = jnp.concatenate([jnp.zeros(2), jnp.full((1,), 0.5),
                          jnp.full((1,), -0.4)])
    gp.state = gpm.set_hyperparams(gp.state, gp.cfg, lp)
    f = str(tmp_path / "gp_warp.npz")
    gp.save(f)
    gp2 = gpm.GP.load(f)
    assert gp2.cfg.input_warp
    np.testing.assert_allclose(np.asarray(gp2.state.log_wa), 0.5, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gp2.state.log_wb), -0.4, rtol=1e-12)
    xq = jnp.asarray(np.random.default_rng(21).uniform(0.1, 0.9, (8, 1)))
    m1, _ = gpm.predict(gp.state, gp.cfg, xq)
    m2, _ = gpm.predict(gp2.state, gp2.cfg, xq)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-8)


def test_warp_acquisition_consistency():
    """The WIP sweep's fantasy math must live in the same (warp) space as
    the posterior: for an identity warp the sweep equals the stationary
    sweep (up to the O(eps) rounding of the identity composition)."""
    from bobe_tpu.acquisition import _wip_sweep_core

    x, y = _data()
    gp0 = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y))
    gp1 = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y),
                 input_warp=True)
    mc = jnp.asarray(np.random.default_rng(11).uniform(0.05, 0.95, (32, 2)))
    a0 = _wip_sweep_core(gp0.cfg, True)(gp0.state, mc)[0]
    a1 = _wip_sweep_core(gp1.cfg, True)(gp1.state, mc)[0]
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=1e-6,
                               atol=1e-12)


def test_dummy_like_keeps_warp_config():
    """The greedy-batch hallucination clone adopts the warp-space Cholesky,
    so it must keep evaluating kernels in warp space."""
    x, y = _warped_data(n=30)
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-6,
                input_warp=True)
    lp = jnp.concatenate([jnp.asarray([np.log(0.4), 0.0]),
                          jnp.asarray([0.6]), jnp.asarray([-0.5])])
    gp.state = gpm.set_hyperparams(gp.state, gp.cfg, lp)
    dummy = gpm.GP.dummy_like(gp)
    assert dummy.cfg.input_warp
    xq = jnp.asarray(np.random.default_rng(17).uniform(0.1, 0.9, (8, 1)))
    m0, v0 = gpm.predict(gp.state, gp.cfg, xq)
    m1, v1 = gpm.predict(dummy.state, dummy.cfg, xq)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-12)


def test_clf_gp_rebuild_keeps_learned_warp():
    """A classifier-GP subset rebuild must carry the learned warp (a fresh
    GP starts at identity, which would silently un-warp the surrogate)."""
    from bobe_tpu.models.clf_gp import GPwithClassifier

    x, y = _data(n=50)
    gp = GPwithClassifier(train_x=x, train_y=y, clf_type="svm",
                          clf_use_size=10, gp_threshold=500.0,
                          input_warp=True, lengthscale_prior=None)
    # short lengthscales keep the 50-point Gram well-conditioned so the
    # interpolation check below is meaningful (ls=1 over the unit square is
    # near-singular and the jitter ladder would dominate)
    lp = jnp.concatenate([jnp.log(jnp.full((2,), 0.3)), jnp.zeros(1),
                          jnp.full((2,), 0.4), jnp.full((2,), -0.3)])
    gp.state = gpm.set_hyperparams(gp.state, gp.cfg, lp)
    x_gp, y_gp = gp._filter_gp_subset()
    gp._rebuild(x_gp, y_gp)
    np.testing.assert_allclose(np.asarray(gp.state.log_wa), 0.4, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gp.state.log_wb), -0.3, rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(gp.state.chol)))
    # the rebuilt factor is the warp-space one: predictions at training
    # points reproduce the targets (near-interpolation at small noise)
    m, _ = gpm.predict(gp.state, gp.cfg, jnp.asarray(x_gp))
    # (a raw-space factor against warp-space queries errs at O(0.1); the
    # residual here is the jitter ladder's regularization)
    np.testing.assert_allclose(np.asarray(m), np.asarray(y_gp), atol=5e-3)


def test_warp_update_extend_consistent_with_refresh():
    """Incremental extend() must produce the same state as a full refresh
    when warping is active (the kernel blocks are built in warp space)."""
    x, y = _warped_data(n=30)
    gp = gpm.GP(train_x=jnp.asarray(x[:24]), train_y=jnp.asarray(y[:24]),
                noise=1e-6, input_warp=True)
    lp = jnp.concatenate([jnp.asarray([np.log(0.4), 0.0]),
                          jnp.asarray([0.5]), jnp.asarray([-0.4])])
    gp.state = gpm.set_hyperparams(gp.state, gp.cfg, lp)
    st_inc = gpm.extend(gp.state, gp.cfg, jnp.asarray(x[24:]),
                        jnp.asarray(y[24:]))
    st_full = gpm.refresh(st_inc, gp.cfg)
    xq = jnp.asarray(np.random.default_rng(13).uniform(0.1, 0.9, (10, 1)))
    m_i, v_i = gpm.predict(st_inc, gp.cfg, xq)
    m_f, v_f = gpm.predict(st_full, gp.cfg, xq)
    np.testing.assert_allclose(np.asarray(m_i), np.asarray(m_f), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_i), np.asarray(v_f), rtol=1e-5,
                               atol=1e-10)


def test_warp_refine_consistent_with_sweep():
    """The local-polish objective must evaluate the SAME function the sweep
    evaluated — both in warp space. With a non-identity warp the polish used
    to build raw-space kernels against the warp-space Cholesky/V/var,
    returning meaningless values that could spuriously win the <= acq_min
    gate (maxiter=0: the refine returns the objective AT the pool argmin, so
    it must equal the sweep's value there)."""
    from bobe_tpu.acquisition import SWEEP_DTYPE, _wip_refine_core, _wip_sweep_core

    x, y = _data(n=40)
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8,
                input_warp=True)
    d = x.shape[1]
    lp = jnp.concatenate([gp.state.log_ls, gp.state.log_amp[None],
                          jnp.full((d,), 0.4), jnp.full((d,), -0.3)])
    st = gpm.set_hyperparams(gp.state, gp.cfg, lp)  # non-identity warp
    mc = jnp.asarray(np.random.default_rng(5).uniform(0.1, 0.9, size=(32, d)))

    acq, V, var = _wip_sweep_core(gp.cfg, True, SWEEP_DTYPE)(st, mc)
    i0 = int(np.argmin(np.asarray(acq)))
    _, f0 = _wip_refine_core(gp.cfg, True, 0)(st, mc[i0][None, :], mc, V, var)
    np.testing.assert_allclose(float(f0), float(acq[i0]), rtol=1e-6)
