"""Results manager: time series, timing ledger, artifact writers, resume."""
import json
import os

import numpy as np
import pytest

from bobe_tpu.utils.results import BOBEResults, ConvergenceInfo


def make_rm(tmp_path, resume=False):
    return BOBEResults(
        output_file="testrun", save_dir=str(tmp_path),
        param_names=["a", "b"], param_labels=["\\alpha", "\\beta"],
        param_bounds=np.array([[0, 1], [0, 2]]).T,
        settings={"acq": "wipstd"}, likelihood_name="test",
        resume_from_existing=resume)


def test_timing_ledger(tmp_path):
    import time

    rm = make_rm(tmp_path)
    rm.start_timing("GP Training")
    time.sleep(0.05)
    rm.end_timing("GP Training")
    t = rm.get_timing_summary()
    assert t["phase_times"]["GP Training"] >= 0.05
    assert 0 <= t["percentages"]["GP Training"] <= 100


def test_series_and_convergence(tmp_path):
    rm = make_rm(tmp_path)
    rm.update_acquisition(1, 0.5, "WIPStd")
    rm.update_gp_hyperparams(1, [0.3, 0.4], 2.0)
    rm.update_best_loglike(1, -3.0)
    rm.update_convergence(2, {"mean": -1.0, "upper": -0.9, "lower": -1.1,
                              "var": 0.01, "std": 0.2}, False, 0.05)
    assert rm.get_last_iteration() == 2
    assert rm.convergence_history[0].delta == pytest.approx(0.1)
    assert not rm.converged


def test_finalize_writes_all_artifacts(tmp_path):
    rm = make_rm(tmp_path)
    samples = {"x": np.random.default_rng(0).uniform(size=(50, 2)),
               "weights": np.ones(50), "logl": np.zeros(50)}
    rm.finalize(samples_dict=samples,
                logz_dict={"mean": -1.0, "upper": -0.9, "lower": -1.1},
                converged=True, termination_reason="LogZ converged",
                gp_info={"gp_training_set_size": 50})
    base = os.path.join(str(tmp_path), "testrun")
    for sfx in ("_results.pkl", ".txt", ".paramnames", ".ranges",
                "_stats.json", "_timing.json", "_intermediate.json"):
        assert os.path.exists(base + sfx), sfx
    # chain file format: weight, -logl, params
    data = np.loadtxt(base + ".txt")
    assert data.shape == (50, 4)
    np.testing.assert_allclose(data[:, 0], 1.0)
    # paramnames format
    lines = open(base + ".paramnames").read().strip().splitlines()
    assert lines[0].split("\t") == ["a", "\\alpha"]
    stats = json.load(open(base + "_stats.json"))
    assert stats["converged"] is True
    assert "posterior_means" in stats


def test_resume_roundtrip(tmp_path):
    rm = make_rm(tmp_path)
    rm.update_acquisition(3, 0.2, "WIPStd")
    rm.update_convergence(4, {"mean": -1.0, "upper": -0.95, "lower": -1.05},
                          True, 0.1)
    rm.save_intermediate()
    rm2 = make_rm(tmp_path, resume=True)
    assert rm2.is_resuming()
    assert rm2.get_last_iteration() == 4
    assert rm2.converged
    assert rm2.convergence_history[-1].threshold == pytest.approx(0.1)


def test_resume_restores_gp_info_and_walltime(tmp_path):
    """A resumed process must carry forward BOTH the gp_info metadata and the
    cumulative wall clock: phase_times are cumulative across process
    generations, so mixing them with a fresh-process _t0 made percentages
    exceed 100% and 'untracked' go negative."""
    import time

    rm = make_rm(tmp_path)
    rm.gp_info = {"gp_training_set_size": 123, "classifier_used": False}
    rm._phase_times["GP Training"] = 500.0
    rm._t0 = time.time() - 600.0  # emulate a 600 s first-generation run
    rm.save_intermediate()

    rm2 = make_rm(tmp_path, resume=True)
    assert rm2.gp_info["gp_training_set_size"] == 123
    t = rm2.get_timing_summary()
    assert t["total_runtime"] >= 600.0
    assert t["percentages"]["GP Training"] <= 100.0
    assert t["untracked"] >= 0.0


def test_load_results(tmp_path):
    rm = make_rm(tmp_path)
    rm.finalize(samples_dict={"x": np.zeros((3, 2)), "weights": np.ones(3),
                              "logl": np.zeros(3)},
                logz_dict={"mean": 0.0, "upper": 0.1, "lower": -0.1},
                converged=False, termination_reason="budget", gp_info={})
    payload = BOBEResults.load_results(os.path.join(str(tmp_path), "testrun"))
    assert payload["state"]["termination_reason"] == "budget"
    assert payload["samples"].shape == (3, 2)


def test_chain_files_match_recorded_golden(tmp_path):
    """Byte-level golden for the GetDist text-chain format (getdist is not
    installed here, so the on-disk convention — '<w> <-logL> <params...>'
    rows, 'name<TAB>label' paramnames, 'name<TAB>lo<TAB>hi' ranges — is
    pinned by recorded files instead of a live round-trip; reference writer:
    BOBE/utils/results.py:682)."""
    rm = make_rm(tmp_path)
    samples = {"x": np.array([[0.25, 0.75], [0.5, 1.0]]),
               "weights": np.array([1.0, 0.5]),
               "logl": np.array([-2.5, -3.0])}
    rm.save_chain_files(samples, filename="golden")
    gold = os.path.join(os.path.dirname(__file__), "data")
    base = os.path.join(str(tmp_path), "golden")
    for sfx in (".txt", ".paramnames", ".ranges"):
        got = open(base + sfx).read()
        want = open(os.path.join(gold, "chain_golden" + sfx)).read()
        assert got == want, f"chain file format drift in {sfx}"


def test_get_mcsamples_contract_with_fake_getdist(tmp_path, monkeypatch):
    """Pin the kwargs get_mcsamples hands to getdist.MCSamples (loglikes is
    the POSITIVE -lnL, ranges is {name: [lo, hi]}) via an injected fake —
    getdist itself is absent in this environment."""
    import sys
    import types

    rm = make_rm(tmp_path)
    rm.final_samples = np.array([[0.1, 0.2], [0.3, 0.4]])
    rm.final_weights = np.array([1.0, 2.0])
    rm.final_loglikes = np.array([-1.5, -2.5])

    seen = {}

    def fake_mcsamples(**kw):
        seen.update(kw)
        return "MCS"

    fake = types.ModuleType("getdist")
    fake.MCSamples = fake_mcsamples
    monkeypatch.setitem(sys.modules, "getdist", fake)

    out = rm.get_mcsamples()
    assert out == "MCS"
    np.testing.assert_allclose(seen["loglikes"], [1.5, 2.5])  # positive -lnL
    np.testing.assert_allclose(seen["samples"], rm.final_samples)
    np.testing.assert_allclose(seen["weights"], [1.0, 2.0])
    assert seen["names"] == rm.param_names
    assert seen["labels"] == rm.param_labels
    assert set(seen["ranges"]) == set(rm.param_names)
    lo, hi = seen["ranges"][rm.param_names[0]]
    assert lo == rm.param_bounds[0, 0] and hi == rm.param_bounds[1, 0]
