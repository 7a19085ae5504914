"""Ensemble jittered-HMC tests: analytic-moment parity, warm restart, and the
GP MC-pool refresh path (the TPU-native replacement for the reference's
per-iteration NUTS refresh, /root/reference/BOBE/bo.py:1314)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bobe_tpu.infer.ehmc import run_ensemble
from bobe_tpu.models.gp import GP
from bobe_tpu.samplers import sample_gp_ensemble, sample_gp_nuts


COV = np.array([[1.0, 0.8], [0.8, 2.0]])
ICOV = jnp.asarray(np.linalg.inv(COV))


def _gauss_logp(ctx, z):
    return -0.5 * z @ ICOV @ z


def test_ensemble_matches_gaussian_moments():
    init = jax.random.normal(jax.random.PRNGKey(1), (64, 2)) * 3.0
    zs, logps, diag = run_ensemble(_gauss_logp, None, init,
                                   jax.random.PRNGKey(0), num_warmup=128,
                                   num_samples=32, thinning=2)
    x = np.asarray(zs).reshape(-1, 2)
    assert float(diag["mean_accept"]) > 0.6
    assert int(diag["n_divergent"]) == 0
    np.testing.assert_allclose(x.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(x, rowvar=False), COV, atol=0.35)


def test_ensemble_warm_restart_stays_calibrated():
    init = jax.random.normal(jax.random.PRNGKey(2), (64, 2)) * 3.0
    _, _, diag = run_ensemble(_gauss_logp, None, init, jax.random.PRNGKey(3),
                              num_warmup=128, num_samples=8, thinning=2)
    warm = (diag["step_size"], diag["mass_inv"], diag["mass_chol"])
    zs, _, d2 = run_ensemble(_gauss_logp, None, diag["last_z"],
                             jax.random.PRNGKey(4), num_warmup=16,
                             num_samples=32, thinning=2, warm=warm,
                             adapt_mass=False)
    x = np.asarray(zs).reshape(-1, 2)
    assert float(d2["mean_accept"]) > 0.6
    np.testing.assert_allclose(x.mean(0), 0.0, atol=0.2)
    np.testing.assert_allclose(np.cov(x, rowvar=False), COV, atol=0.45)


def _make_gp(seed=0, n=60):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, 2))
    y = -0.5 * np.sum(((x - 0.55) / 0.12) ** 2, axis=1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y))
    gp.fit(n_restarts=2, maxiter=100, rng=rng)
    return gp


def test_sample_gp_ensemble_matches_nuts_moments():
    gp = _make_gp()
    rng = np.random.default_rng(0)
    ens = sample_gp_ensemble(gp, np_rng=rng, rng_key=jax.random.PRNGKey(5),
                             num_samples=1024)
    nuts = sample_gp_nuts(gp, np_rng=rng, rng_key=jax.random.PRNGKey(6),
                          warmup_steps=256, num_samples=512, thinning=2)
    assert ens["x"].shape[1] == 2
    assert ens["method"] == "MCMC"
    np.testing.assert_allclose(ens["x"].mean(0), nuts["x"].mean(0), atol=0.03)
    np.testing.assert_allclose(ens["x"].std(0), nuts["x"].std(0), atol=0.03)


def test_sample_gp_ensemble_warm_state_roundtrip():
    gp = _make_gp(seed=1)
    rng = np.random.default_rng(1)
    first = sample_gp_ensemble(gp, np_rng=rng, rng_key=jax.random.PRNGKey(7),
                               num_samples=512)
    ws = first["warm_state"]
    assert ws["kind"] == "ehmc" and ws["last_z"].shape == (64, 2)
    second = sample_gp_ensemble(gp, np_rng=rng, rng_key=jax.random.PRNGKey(8),
                                num_samples=512, warm_state=ws)
    # warm refresh must stay on-target (same GP posterior)
    np.testing.assert_allclose(second["x"].mean(0), first["x"].mean(0),
                               atol=0.05)
    assert second["diagnostics"]["mean_accept"] > 0.5


def test_nuts_warm_state_rejected_by_ensemble_and_vice_versa():
    gp = _make_gp(seed=2)
    rng = np.random.default_rng(2)
    ens = sample_gp_ensemble(gp, np_rng=rng, rng_key=jax.random.PRNGKey(9),
                             num_samples=256)
    # an ehmc warm state handed to NUTS must be ignored (cold run), not crash
    out = sample_gp_nuts(gp, np_rng=rng, rng_key=jax.random.PRNGKey(10),
                         warmup_steps=64, num_samples=64, thinning=2,
                         warm_state=ens["warm_state"])
    assert out["x"].shape[1] == 2


def test_get_mc_samples_ehmc_dispatch():
    from bobe_tpu.acquisition import get_mc_samples

    gp = _make_gp(seed=3, n=40)
    out = get_mc_samples(gp, method="EHMC", num_samples=256,
                         np_rng=np.random.default_rng(3),
                         rng_key=jax.random.PRNGKey(11))
    assert out["x"].shape[0] >= 256
    assert np.all((out["x"] >= 0) & (out["x"] <= 1))
    assert out["warm_state"]["kind"] == "ehmc"
    # method defaults apply when the tuning knobs are left None
    assert out["warm_state"]["num_chains"] == 64


def test_get_mc_samples_forwards_tuning_to_ehmc():
    """Explicit num_chains/warmup_steps/thinning must reach the ensemble
    sampler (regression: they used to be silently dropped, making
    BOBE.run(num_chains=...) a no-op under the default EHMC refresh)."""
    from bobe_tpu.acquisition import get_mc_samples

    gp = _make_gp(seed=3, n=40)
    out = get_mc_samples(gp, method="EHMC", num_samples=256, num_chains=16,
                         warmup_steps=32, thinning=1,
                         np_rng=np.random.default_rng(3),
                         rng_key=jax.random.PRNGKey(12))
    assert out["warm_state"]["num_chains"] == 16
    assert out["warm_state"]["last_z"].shape[0] == 16
    assert out["x"].shape[0] >= 256


def test_zero_warmup_honors_warm_step_size():
    """num_warmup=0 with a warm (eps, mass) must sample at the WARM step
    size: dual averaging used to initialize log_eps_avg to 0, so zero
    adaptation steps silently produced eps_final = exp(0) = 1.0 regardless
    of the warm value."""
    eps_warm = 0.0625
    warm = (jnp.asarray(eps_warm), jnp.eye(2, dtype=jnp.float64),
            jnp.eye(2, dtype=jnp.float64))
    init = jax.random.normal(jax.random.PRNGKey(0), (8, 2), dtype=jnp.float64)
    _, _, diag = run_ensemble(_gauss_logp, None, init, jax.random.PRNGKey(1),
                              num_warmup=0, num_samples=4, thinning=1,
                              warm=warm, adapt_mass=False)
    assert float(diag["step_size"]) == pytest.approx(eps_warm)
