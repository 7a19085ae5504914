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


# ---------------------------------------------------------------- plateau fix

class _GatedToy:
    """Duck-typed classifier-gated surrogate: Gaussian centered inside
    {x0 >= cut} (the failure boundary at 1.5 sigma, the realistic clf-GP
    regime), a minus_inf plateau over the 60% of the box below the cut."""
    minus_inf = -1e10
    use_clf = True

    def __init__(self, d=2, cut=0.6, sigma=0.1, c0=0.75):
        self.d, self.cut, self.sigma, self.c0 = d, cut, sigma, c0

    def _center(self):
        c = np.full(self.d, 0.5)
        c[0] = self.c0
        return c

    def loglike(self, x):
        c = jnp.asarray(self._center())
        ll = (-0.5 * jnp.sum(((x - c) / self.sigma) ** 2, axis=-1)
              - 0.5 * self.d * jnp.log(2 * jnp.pi * self.sigma**2))
        return jnp.where(x[..., 0] >= self.cut, ll, self.minus_inf)

    def logz_true(self):
        from scipy.stats import norm
        m0 = (norm.cdf((1.0 - self.c0) / self.sigma)
              - norm.cdf((self.cut - self.c0) / self.sigma))
        mb = norm.cdf(0.5 / self.sigma) - norm.cdf(-0.5 / self.sigma)
        return float(np.log(m0) + (self.d - 1) * np.log(mb))

    def get_random_point(self, rng=None, nstd=1.0):
        return np.full(self.d, 0.7)


def test_seed_live_points_feasible_fraction():
    """Rejection seeding must return an all-feasible live set and the
    log feasible fraction (the NS ledger start) with its binomial variance."""
    from bobe_tpu.samplers import _seed_live_points

    toy = _GatedToy()
    rng = np.random.default_rng(0)
    ll = lambda x: toy.loglike(x)
    lx, lgl, logvol0, var0 = _seed_live_points(toy, ll, 100, toy.d, rng)
    assert lx.shape == (100, toy.d) and np.all(lgl > toy.minus_inf)
    # feasible fraction is exactly 1 - cut = 0.4 of the unit box
    assert abs(logvol0 - np.log(0.4)) < 0.05
    assert 0 < var0 < 1e-3


def test_plateau_volume_accounting_unbiased():
    """NS over a classifier-gated (plateau) surrogate: the restricted-support
    ledger must remove the -f - log(1-f) plateau bias (the role dynesty's
    plateau handling plays for the reference). Regression for the +0.77
    planck-like evidence bias (BENCH_NOTES round 2)."""
    import jax

    from bobe_tpu.infer import integrals
    from bobe_tpu.infer.nested import run_nested
    from bobe_tpu.samplers import _seed_live_points

    toy = _GatedToy()
    lz_true = toy.logz_true()
    rng = np.random.default_rng(3)
    apply_fn = lambda ctx, x: toy.loglike(x)
    ll = lambda x: toy.loglike(x)
    lx, lgl, logvol0, _ = _seed_live_points(toy, ll, 300, toy.d, rng)
    res = run_nested(apply_fn, None, toy.d, jax.random.PRNGKey(7), nlive=300,
                     dlogz=0.01, live_x=lx, live_logl=lgl, logvol0=logvol0)
    lz = integrals.trapezoid_logz(res.dead_logl, res.logvol,
                                  lv_start=res.logvol0)[-1]
    assert abs(lz - lz_true) < 0.15, (lz, lz_true)

    # control: the pre-fix behavior (plateau points in the live set, ledger
    # at 0) is biased high by ~ -f - log(1-f); keep the demonstration so the
    # bias magnitude stays documented
    lx2 = rng.uniform(size=(300, toy.d))
    lgl2 = np.asarray(ll(jnp.asarray(lx2)))
    res2 = run_nested(apply_fn, None, toy.d, jax.random.PRNGKey(8), nlive=300,
                      dlogz=0.01, live_x=lx2, live_logl=lgl2)
    lz2 = integrals.trapezoid_logz(res2.dead_logl, res2.logvol)[-1]
    f = toy.cut
    predicted_bias = -f - np.log(1 - f)
    assert lz2 - lz_true > 0.5 * predicted_bias


def test_nuts_warm_start_reuses_kernel(gp_gaussian):
    """Warm-started NUTS (fixed mass + short re-adaptation from the previous
    adapted kernel) must sample the same posterior as a cold run."""
    from bobe_tpu.samplers import sample_gp_nuts

    from bobe_tpu.samplers import _mesh_aligned_chains

    cold = sample_gp_nuts(gp_gaussian, np_rng=np.random.default_rng(0),
                          num_samples=512, warmup_steps=256)
    ws = cold["warm_state"]
    nc = _mesh_aligned_chains(4)  # default 4 chains align to the test mesh
    assert ws["mass_inv"].shape == (nc, 2, 2) and ws["last_z"].shape == (nc, 2)
    warm = sample_gp_nuts(gp_gaussian, np_rng=np.random.default_rng(1),
                          num_samples=512, warmup_steps=256, warm_state=ws)
    assert warm["x"].shape == cold["x"].shape
    assert float(np.mean(warm["diagnostics"]["mean_accept"])) > 0.6
    # posterior is the 2-D Gaussian at 0.5 with sd 0.15: moments must agree
    for out in (cold, warm):
        m = out["x"].mean(axis=0)
        s = out["x"].std(axis=0)
        assert np.all(np.abs(m - 0.5) < 0.05), m
        assert np.all(np.abs(s - 0.15) < 0.05), s
    # mismatched shape metadata must fall back to the cold path, not crash
    bad = dict(ws, num_chains=3)
    res = sample_gp_nuts(gp_gaussian, np_rng=np.random.default_rng(2),
                         num_samples=256, warmup_steps=128, warm_state=bad)
    assert res["x"].shape[1] == 2


def test_nuts_warm_start_takes_warm_path(gp_gaussian, monkeypatch):
    """Pin that a valid warm_state actually takes the warm (fixed-mass)
    runner — a guard regression that silently always falls back to cold
    would otherwise be invisible to the behavioral test above."""
    import bobe_tpu.samplers as samplers_mod

    calls = []
    orig = samplers_mod._nuts_runner

    def spy(apply, warmup, num_samples, thinning, dense, depth, warm=False):
        calls.append(bool(warm))
        return orig(apply, warmup, num_samples, thinning, dense, depth, warm)

    monkeypatch.setattr(samplers_mod, "_nuts_runner", spy)
    cold = samplers_mod.sample_gp_nuts(
        gp_gaussian, np_rng=np.random.default_rng(5),
        num_samples=128, warmup_steps=64)
    warm = samplers_mod.sample_gp_nuts(
        gp_gaussian, np_rng=np.random.default_rng(6),
        num_samples=128, warmup_steps=64, warm_state=cold["warm_state"])
    assert calls == [False, True], calls
    assert warm["x"].shape == cold["x"].shape


def test_nested_sampling_merge_tightens_sampler_noise(gp_gaussian):
    """merge_with combines runs at the dead-point level: the merged estimate
    must carry lower sampler noise than either single run and stay within
    the single-run scatter of the analytic evidence."""
    want = np.log(2 * np.pi * 0.15**2)
    s1, lz1, ok1 = nested_sampling(gp_gaussian, mode="convergence", dlogz=0.01,
                                   rng=np.random.default_rng(5))
    assert ok1 and "raw" in s1
    s2, lz2, ok2 = nested_sampling(gp_gaussian, mode="convergence", dlogz=0.01,
                                   rng=np.random.default_rng(6),
                                   merge_with=[s1["raw"]])
    assert ok2
    # ~sqrt(2) noise reduction for two equal-nlive runs (allow slack for the
    # schedule edges): merged error must be clearly below the single-run one
    assert lz2["dlogz_sampler"] < 0.8 * lz1["dlogz_sampler"]
    assert abs(lz2["mean"] - want) < 0.3
    # merged raw can be merged again: counts stack to ~3x nlive in the bulk
    s3, lz3, ok3 = nested_sampling(gp_gaussian, mode="convergence", dlogz=0.01,
                                   rng=np.random.default_rng(7),
                                   merge_with=[s2["raw"]])
    assert ok3
    assert lz3["dlogz_sampler"] < lz2["dlogz_sampler"]


def test_nested_sampling_n_runs_merges_without_recompiling(gp_gaussian):
    """n_runs=b repeats the sampler at the SAME static configuration and
    merges at the dead-point level: sampler noise must drop ~1/sqrt(b) and —
    the point of the feature — the jitted NS loop must gain NO new compile
    entries vs a single run (a boosted nlive is a new static shape whose
    mega-graph compile costs minutes on relay TPUs; the final-precision
    passes in bo.py rely on this)."""
    from bobe_tpu.infer.nested import _ns_loop

    want = np.log(2 * np.pi * 0.15**2)
    s1, lz1, ok1 = nested_sampling(gp_gaussian, mode="convergence", dlogz=0.01,
                                   rng=np.random.default_rng(8))
    assert ok1
    n_compiles = _ns_loop._cache_size()
    s3, lz3, ok3 = nested_sampling(gp_gaussian, mode="convergence", dlogz=0.01,
                                   n_runs=3, rng=np.random.default_rng(9))
    assert ok3
    assert _ns_loop._cache_size() == n_compiles, \
        "n_runs must reuse the single-run NS graph"
    # ~sqrt(3) noise reduction; allow slack for schedule edges
    assert lz3["dlogz_sampler"] < 0.75 * lz1["dlogz_sampler"]
    assert abs(lz3["mean"] - want) < 0.3
    # merged raw tuple has the stacked live-count schedule (peak ~3x nlive)
    assert float(np.max(s3["raw"][2])) > 2.0 * float(np.max(s1["raw"][2]))


def test_information_err_schedule_consistency():
    """A constant per-death schedule must reproduce the scalar-nlive error."""
    from bobe_tpu.infer import integrals

    rng = np.random.default_rng(0)
    n = 400
    logvol = -np.arange(1, n + 1) / 50.0
    logl = np.sort(rng.normal(size=n))  # ascending, arbitrary scale
    logz = integrals.trapezoid_logz(logl, logvol)[-1]
    h_s, err_s = integrals.information_and_err(logl, logvol, logz, 50)
    h_a, err_a = integrals.information_and_err(logl, logvol, logz,
                                               np.full(n, 50.0))
    assert h_s == h_a
    # array path clips negative per-point increments -> conservative (>=)
    assert err_a >= err_s * 0.999
    assert err_a < 3.0 * err_s


def test_seed_live_points_fallback_keeps_found_feasible():
    """When rejection seeding finds SOME but not enough feasible points, the
    mixed-live-set fallback must keep them (a previous version redrew a
    fresh pool and discarded up to nlive-1 feasible points), and a live-set
    request larger than the proposal pool must not crash the choice()."""
    from bobe_tpu.samplers import _seed_live_points

    toy = _GatedToy(d=2, cut=0.9995)  # feasible fraction ~ 5e-4
    rng = np.random.default_rng(2)
    ll = lambda x: toy.loglike(x)
    lx, lgl, logvol0, var0 = _seed_live_points(toy, ll, 150, toy.d, rng)
    n_feas_kept = int(np.sum(lgl > toy.minus_inf))
    # ~20 batches x 10k draws x 5e-4 ~ 100 feasible found; all must survive
    assert n_feas_kept >= 50, n_feas_kept
    assert lx.shape == (150, toy.d)
    assert logvol0 == 0.0 and var0 == 0.0  # mixed set: no volume shift


def test_warm_plateau_guard_is_temperature_aware(monkeypatch):
    """apply() returns the TEMPERED logp, so the plateau sits at
    ~minus_inf/temp: with temp > 2 the old untempered 0.5*minus_inf
    threshold waved infeasible chain ends through to the warm path."""
    import bobe_tpu.samplers as samplers_mod
    from bobe_tpu.models.clf_gp import GPwithClassifier

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(40, 2))
    y = -np.sum(((x - 0.5) / 0.2) ** 2, axis=1) * 30
    gp = GPwithClassifier(train_x=x, train_y=y, clf_type="svm",
                          clf_use_size=10, noise=1e-8)
    gp.train_classifier()
    assert gp._clf_ctx is not None  # classifier active (two classes)

    calls = []
    orig = samplers_mod._nuts_runner

    def spy(apply, warmup, num_samples, thinning, dense, depth, warm=False):
        calls.append(bool(warm))
        return orig(apply, warmup, num_samples, thinning, dense, depth, warm)

    monkeypatch.setattr(samplers_mod, "_nuts_runner", spy)
    temp = 4.0
    cold = samplers_mod.sample_gp_nuts(
        gp, np_rng=np.random.default_rng(8), num_chains=2,
        num_samples=64, warmup_steps=64, temp=temp)
    ws = dict(cold["warm_state"])
    # strand every cached chain end on the infeasible plateau
    x_bad = np.asarray(gp.train_x_clf)[int(np.argmin(np.asarray(gp.train_y_clf)))]
    assert float(gp.predict_single(jnp.asarray(x_bad))[0]) <= gp.minus_inf / 2
    z_bad = np.log(np.clip(x_bad, 1e-6, 1 - 1e-6)) \
        - np.log1p(-np.clip(x_bad, 1e-6, 1 - 1e-6))
    ws["last_z"] = np.tile(z_bad, (ws["last_z"].shape[0], 1))
    calls.clear()
    samplers_mod.sample_gp_nuts(
        gp, np_rng=np.random.default_rng(9), num_chains=2,
        num_samples=64, warmup_steps=64, temp=temp, warm_state=ws)
    assert calls and calls[0] is False, calls  # guard forced the cold path
