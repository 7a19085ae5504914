"""High-dimensional NS regression: the d=30 decorrelation fix.

Round-3 root cause (BENCH_NOTES): at d=30 the 1.5d slice repeats left NS
replacements correlated with their clone parents — logZ biased up to +0.4 on
the TRUE 30-d Gaussian — and the fixed maxcall=5e6 silently truncated runs.
Fix: convergence-mode repeats scale to 3d above d=16, maxcall scales with
nlive * n_repeats.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bobe_tpu.infer.integrals import trapezoid_logz
from bobe_tpu.infer.nested import run_nested
from bobe_tpu.models import toys


def _gauss_apply(d, sigma=0.12):
    mean = jnp.full(d, 0.5)

    def loglike_apply(ctx, x):
        return (-0.5 * jnp.sum(((x - mean) / sigma) ** 2, axis=-1)
                - 0.5 * d * jnp.log(2 * jnp.pi * sigma**2))

    return loglike_apply


def test_convergence_mode_scales_repeats_and_maxcall(monkeypatch):
    """nested_sampling must request 3d repeats and a proportional call budget
    for convergence-mode runs above d=16."""
    from bobe_tpu import samplers
    from bobe_tpu.models.gp import GP

    d = 24
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(40, d))
    y = -np.sum((x - 0.5) ** 2, axis=1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y))

    seen = {}

    def fake_run_nested(apply_fn, ctx, ndim, key, **kw):
        seen.update(kw)
        raise RuntimeError("stop")

    monkeypatch.setattr(samplers, "run_nested", fake_run_nested)
    with pytest.raises(RuntimeError):
        samplers.nested_sampling(gp, mode="convergence", rng=rng)
    assert seen["n_repeats"] == int(np.ceil(3.0 * d))
    nlive_conv = samplers.ns_settings("convergence", d)[0]
    # the call budget grows with d: iterations-to-convergence ~ H*nlive/kills
    # and H grows with dimension (100x truncated d=30/nlive=1200 at ~80%
    # depth — round-5 measurement in samplers.nested_sampling)
    assert seen["maxcall"] == max(int(5e6),
                                  (100 + 5 * d) * nlive_conv * seen["n_repeats"])

    # acq mode keeps the cheap defaults (no n_repeats override)
    seen.clear()
    with pytest.raises(RuntimeError):
        samplers.nested_sampling(gp, mode="acq", rng=rng)
    assert "n_repeats" not in seen or seen.get("n_repeats") is None


@pytest.mark.slow
def test_ns_30d_gaussian_unbiased():
    """5-seed mean error on the true 30-d Gaussian must be ~0 under the 3d
    repeats (was +0.22 with 1.5d repeats; the worst seed was +0.43)."""
    d = 30
    _, _, logz_true = toys.make_gaussian(d, sigma=0.12)
    apply_fn = _gauss_apply(d)
    errs, raws = [], []
    for seed in range(5):
        res = run_nested(apply_fn, None, d, jax.random.PRNGKey(seed),
                         nlive=1200, dlogz=0.01, maxcall=int(2e7),
                         n_repeats=90, rng=np.random.default_rng(seed))
        assert res.success
        errs.append(float(trapezoid_logz(res.dead_logl, res.logvol)[-1])
                    - logz_true)
        raws.append((res.dead_x, res.dead_logl,
                     np.asarray(res.nlive_schedule, float), -np.inf))
    mean = float(np.mean(errs))
    assert abs(mean) < 0.12, f"NS d=30 bias regressed: mean={mean} errs={errs}"
    assert max(abs(e) for e in errs) < 0.35, errs
    # run-merging is the production margin lever (round-4 TPU campaign:
    # nlive=4800 single-run 5-seed maxabs 0.122 -> 0.058 with 3 merged runs;
    # bo.py._ns_boost targets threshold/2 on this basis). Merging these five
    # independent runs must tighten the error by ~sqrt(5): effective
    # nlive=6000 -> sigma ~ 0.06, so the merged error stays within ~2.5 sigma.
    from bobe_tpu.infer.nested import merge_runs

    _, logls, logvol, _ = merge_runs(raws)
    err_m = float(trapezoid_logz(logls, logvol)[-1]) - logz_true
    assert abs(err_m) < 0.15, (err_m, errs)
