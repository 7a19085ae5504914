"""Correctness tests for the on-device inference engines.

Gold standards: analytic log-evidence of Gaussians on the unit box (NS) and
analytic moments of correlated Gaussians (NUTS). These are the integration
oracles the reference validates against dynesty for (e.g. examples/Banana.py
cross-check); here the analytic values are exact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bobe_tpu.infer import integrals
from bobe_tpu.infer.nested import run_nested
from bobe_tpu.infer.nuts import run_chain


# ------------------------------------------------------------------ helpers

def gaussian_loglike_apply(mean, sigma):
    mean = jnp.asarray(mean)

    def apply(ctx, x):
        return -0.5 * jnp.sum(((x - mean) / sigma) ** 2, axis=-1) \
            - 0.5 * mean.shape[0] * jnp.log(2 * jnp.pi * sigma**2)

    return apply


def analytic_logz(d, sigma, mean=0.5):
    """log int_box N(x; mean, sigma^2 I) dx over [0,1]^d (unit prior)."""
    from scipy.stats import norm

    mass = (norm.cdf((1 - mean) / sigma) - norm.cdf((0 - mean) / sigma)) ** d
    return float(np.log(mass))


# ----------------------------------------------------------------- NS tests

def test_trapezoid_logz_analytic_exponential():
    # L(X) = exp(-X) over X in (0,1]: Z = 1 - e^-1. Use dense logvol grid.
    logvol = np.linspace(0, -25, 4000)[1:]
    logl = -np.exp(logvol)
    lz = integrals.trapezoid_logz(logl, logvol)[-1]
    # 5e-3: the NS convention takes L=0 at the X=1 boundary (first interval)
    np.testing.assert_allclose(np.exp(lz), 1 - np.exp(-1), rtol=5e-3)


@pytest.mark.parametrize("d,sigma", [(2, 0.1), (4, 0.15)])
def test_nested_sampling_gaussian_logz(d, sigma):
    apply = gaussian_loglike_apply(np.full(d, 0.5), sigma)
    res = run_nested(apply, jnp.zeros(()), d, jax.random.PRNGKey(0),
                     nlive=300, dlogz=0.05,
                     rng=np.random.default_rng(1))
    assert res.success
    lz = integrals.trapezoid_logz(res.dead_logl, res.logvol)[-1]
    want = analytic_logz(d, sigma)
    assert abs(lz - want) < 0.15, f"logz {lz} vs analytic {want}"
    # information-based error bar should be sane and cover the error
    h, err = integrals.information_and_err(res.dead_logl, res.logvol, lz, res.nlive)
    assert 0 < err < 0.5
    assert abs(lz - want) < 4 * err + 0.05


def test_nested_sampling_posterior_moments():
    d, sigma = 2, 0.08
    apply = gaussian_loglike_apply(np.asarray([0.4, 0.6]), sigma)
    res = run_nested(apply, jnp.zeros(()), d, jax.random.PRNGKey(2),
                     nlive=300, dlogz=0.05, rng=np.random.default_rng(3))
    logwt = integrals.logwt_from(res.dead_logl, res.logvol)
    w = np.exp(logwt - logwt.max())
    w /= w.sum()
    mean = (res.dead_x * w[:, None]).sum(0)
    np.testing.assert_allclose(mean, [0.4, 0.6], atol=0.01)
    var = ((res.dead_x - mean) ** 2 * w[:, None]).sum(0)
    np.testing.assert_allclose(np.sqrt(var), sigma, rtol=0.15)


def test_nested_sampling_sigma_bounds_bracket():
    d, sigma = 2, 0.1
    apply = gaussian_loglike_apply(np.full(d, 0.5), sigma)
    res = run_nested(apply, jnp.zeros(()), d, jax.random.PRNGKey(4),
                     nlive=200, dlogz=0.1, rng=np.random.default_rng(5))
    gp_sigma = np.full(len(res.dead_logl), 0.05)  # pretend GP uncertainty
    out = integrals.logz_bounds_from_gp_sigma(res.dead_logl, res.logvol, gp_sigma)
    assert out["lower"] < out["mean"] < out["upper"]
    assert (out["upper"] - out["lower"]) / 2 == pytest.approx(0.05, rel=0.3)
    assert out["var"] > 0


# ---------------------------------------------------------------- NUTS tests

def test_nuts_recovers_gaussian_moments():
    # correlated 2-D Gaussian on R^2
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -0.5])

    def apply(ctx, z):
        d = z - mu
        return -0.5 * d @ prec @ d

    zs, logps, diag = run_chain(apply, jnp.zeros(()), jnp.zeros(2),
                                jax.random.PRNGKey(0), num_warmup=300,
                                num_samples=800, thinning=2, dense_mass=True,
                                max_depth=6)
    s = np.asarray(zs)
    assert np.all(np.isfinite(s))
    np.testing.assert_allclose(s.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.3)
    assert float(diag["mean_accept"]) > 0.5
    assert int(diag["n_divergent"]) == 0


def test_nuts_vmapped_chains():
    def apply(ctx, z):
        return -0.5 * jnp.sum(z * z)

    from functools import partial

    runner = jax.vmap(
        partial(run_chain, apply, num_warmup=150, num_samples=300, thinning=2,
                dense_mass=False, max_depth=5), in_axes=(None, 0, 0))
    init = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    zs, logps, diag = runner(jnp.zeros(()), init, keys)
    assert zs.shape == (4, 150, 3)
    s = np.asarray(zs).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), np.zeros(3), atol=0.15)
    np.testing.assert_allclose(s.std(0), np.ones(3), atol=0.2)


def test_segmented_ns_bit_identical(monkeypatch):
    """Segmented dispatch (tiny fixed chunks) must reproduce the single-
    dispatch run EXACTLY — the PRNG chain lives in the loop carry."""
    import jax
    import jax.numpy as jnp
    from bobe_tpu.infer.nested import run_nested

    def loglike_apply(ctx, x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)

    key = jax.random.PRNGKey(9)
    rng_seed = 123

    monkeypatch.setenv("BOBE_TPU_NS_CHUNK_CALLS", "0")  # single dispatch
    a = run_nested(loglike_apply, None, 2, key, nlive=100, dlogz=0.05,
                   rng=np.random.default_rng(rng_seed))
    monkeypatch.setenv("BOBE_TPU_NS_CHUNK_CALLS", "500")  # many tiny segments
    b = run_nested(loglike_apply, None, 2, key, nlive=100, dlogz=0.05,
                   rng=np.random.default_rng(rng_seed))
    assert a.n_iter == b.n_iter and a.n_calls == b.n_calls
    np.testing.assert_array_equal(a.dead_logl, b.dead_logl)
    np.testing.assert_array_equal(a.dead_x, b.dead_x)
    np.testing.assert_array_equal(a.logvol, b.logvol)
    assert a.logz == b.logz


def test_max_dead_truncation_warns(monkeypatch):
    """Exhausting the dead-point buffer before the stopping rule fired used
    to be a SILENT truncation path (only the maxcall exit warned)."""
    import bobe_tpu.infer.nested as nested_mod

    warned = []
    monkeypatch.setattr(nested_mod.log, "warning",
                        lambda msg, *a: warned.append(msg))
    apply = gaussian_loglike_apply(np.full(2, 0.5), 0.05)
    res = run_nested(apply, jnp.zeros(()), 2, jax.random.PRNGKey(4),
                     nlive=100, dlogz=0.001, max_dead=120,
                     rng=np.random.default_rng(5))
    assert res.n_iter > 0
    assert any("max_dead" in w for w in warned), warned


def test_dynamic_decorrelation_honors_n_repeats(monkeypatch):
    """The dynamic batch-seed decorrelation pass must use the SAME slice
    depth as the runs (samplers.py raises n_repeats to 3d for d >= 10; a
    hardcoded 1.5d left the duplicated seeds correlated with their parents
    and re-introduced the measured high-d merge bias)."""
    import bobe_tpu.infer.nested as nested_mod

    seen = []
    orig = nested_mod._decorrelate

    def spy(apply, ctx, x0, l0, lstar, key, n_repeats, max_shrink, **kw):
        seen.append(n_repeats)
        return orig(apply, ctx, x0, l0, lstar, key, n_repeats, max_shrink,
                    **kw)

    monkeypatch.setattr(nested_mod, "_decorrelate", spy)
    apply = gaussian_loglike_apply(np.full(2, 0.5), 0.1)
    res = nested_mod.run_nested_dynamic(
        apply, jnp.zeros(()), 2, jax.random.PRNGKey(6), nlive=100,
        dlogz=0.05, rng=np.random.default_rng(7), n_repeats=9)
    assert res.success
    assert seen == [9], seen


def test_spec_candidates_match_sequential_shrinkage():
    """The speculative shrink chain must reproduce the sequential slice
    algorithm exactly: candidate s is what the per-draw loop would propose
    after s rejections (the bracket transition depends only on the rejected
    t's sign, never on the likelihood — the invariant speculation rests on),
    and the end bracket equals the sequential end bracket."""
    from bobe_tpu.infer.nested import _spec_candidates

    rng = np.random.default_rng(0)
    n, spec = 7, 5
    u = jnp.asarray(rng.uniform(size=(spec, n)))
    lo0 = jnp.asarray(-rng.uniform(0.5, 2.0, size=n))
    hi0 = jnp.asarray(rng.uniform(0.5, 2.0, size=n))

    ts, lo_end, hi_end = _spec_candidates(u, lo0, hi0, spec)
    assert ts.shape == (n, spec)

    # sequential reference: draw, assume rejection, shrink toward 0
    lo, hi = np.asarray(lo0).copy(), np.asarray(hi0).copy()
    for s in range(spec):
        t = lo + (hi - lo) * np.asarray(u[s])
        np.testing.assert_allclose(np.asarray(ts[:, s]), t, rtol=1e-12)
        shrink_lo = t < 0
        lo = np.where(shrink_lo, t, lo)
        hi = np.where(~shrink_lo, t, hi)
    np.testing.assert_allclose(np.asarray(lo_end), lo, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hi_end), hi, rtol=1e-12)
    # every candidate stays inside the ORIGINAL bracket and the chain is
    # nested (each candidate inside the previous candidate's bracket)
    assert np.all(np.asarray(ts) >= np.asarray(lo0)[:, None] - 1e-15)
    assert np.all(np.asarray(ts) <= np.asarray(hi0)[:, None] + 1e-15)


def test_dlogz_hyp_folds_hyperfit_spread_into_err_total():
    """Evidence bounds propagate hyperparameter-fit uncertainty: one fit
    basin -> dlogz_hyp == 0; a genuinely different second basin -> a
    positive spread folded into err_total in quadrature (beyond-reference:
    the reference reports raw GP-sigma bounds, samplers.py:172-185)."""
    from bobe_tpu.models.gp import GP
    from bobe_tpu.samplers import nested_sampling

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(48, 2))
    y = -0.5 * np.sum(((x - 0.5) / 0.15) ** 2, axis=1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    gp.fit(n_restarts=2, maxiter=80)
    gp._fit_basins = gp._fit_basins[:1]
    _, logz1, ok1 = nested_sampling(gp, mode="convergence", nlive=128,
                                    rng=np.random.default_rng(1),
                                    rng_key=jax.random.PRNGKey(1))
    assert ok1 and logz1["dlogz_hyp"] == 0.0
    # acq-mode pools skip the basin work entirely (cost gate)
    _, logz_acq, _ = nested_sampling(gp, mode="acq",
                                     rng=np.random.default_rng(1),
                                     rng_key=jax.random.PRNGKey(1))
    assert logz_acq["dlogz_hyp"] == 0.0

    # inject a second basin with clearly different lengthscales, 1 nat off
    p0, f0 = gp._fit_basins[0]
    alt = np.asarray(p0, dtype=float).copy()
    alt[:2] += 1.5  # much longer lengthscales -> different surrogate mean
    gp._fit_basins = [(p0, f0), (alt, f0 + 1.0)]
    _, logz2, ok2 = nested_sampling(gp, mode="convergence", nlive=128,
                                    rng=np.random.default_rng(1),
                                    rng_key=jax.random.PRNGKey(1))
    assert ok2
    assert logz2["dlogz_hyp"] > 0.0
    assert logz2["err_total"] >= logz2["dlogz_hyp"] * 0.999
    # quadrature composition: err_total^2 - dlogz_hyp^2 == the two-term
    # total of the single-basin run (same rng -> same realization)
    np.testing.assert_allclose(
        logz2["err_total"] ** 2 - logz2["dlogz_hyp"] ** 2,
        logz1["err_total"] ** 2, rtol=1e-6)
