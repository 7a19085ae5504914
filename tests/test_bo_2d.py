"""End-to-end BOBE runs on 2-D toys (mirroring /root/reference/tests/test_bo_2d.py):
EI on Rosenbrock (no samples/logz produced), WIPStd on Himmelblau with uniform
MC points, plus the classifier path."""
import numpy as np
import pytest
import jax.numpy as jnp

from bobe_tpu.bo import BOBE
from bobe_tpu.models import toys


def test_bobe_ei_rosenbrock(tmp_path):
    bobe = BOBE(
        loglikelihood=toys.rosenbrock,
        param_list=toys.rosenbrock_names,
        param_bounds=toys.rosenbrock_bounds,
        likelihood_name="rosenbrock_test",
        n_sobol_init=8,
        seed=3,
        save_dir=str(tmp_path),
        verbosity="WARNING",
        pool="serial",
    )
    results = bobe.run(acq="logei", max_evals=16, max_gp_size=40,
                       ei_goal=1e-8, convergence_n_iters=1, fit_n_points=4)
    assert results is not None
    for key in ("gp", "likelihood", "results_manager", "best_val", "best_pt",
                "logz", "termination_reason", "samples"):
        assert key in results
    # EI produces no samples/logz (reference tests/test_bo_2d.py:79-80)
    assert results["samples"] == {}
    assert results["logz"] == {}
    assert results["best_val"] > -1000.0


def test_bobe_wipstd_himmelblau(tmp_path):
    bobe = BOBE(
        loglikelihood=toys.himmelblau,
        param_list=toys.himmelblau_names,
        param_bounds=toys.himmelblau_bounds,
        likelihood_name="himmelblau_test",
        n_sobol_init=24,
        seed=5,
        save_dir=str(tmp_path),
        verbosity="WARNING",
        pool="serial",
    )
    results = bobe.run(acq="wipstd", min_evals=40, max_evals=160,
                       max_gp_size=200, logz_threshold=0.05,
                       convergence_n_iters=2, fit_n_points=8, batch_size=4,
                       ns_n_points=8, mc_points_size=256, do_final_ns=True)
    assert results is not None
    samples = results["samples"]
    assert len(samples) > 0 and samples["x"].shape[1] == 2
    # samples are in PHYSICAL space
    assert samples["x"].min() < -0.5 and samples["x"].max() > 0.5
    logz = results["logz"]
    assert "mean" in logz  # do_final_ns guarantees an NS run
    # TRUE Himmelblau logZ on [-5,5]^2 with uniform prior is -5.504 (brute
    # force quadrature on a 4001^2 grid). NOTE: the reference docs quote
    # "~ -3.2" (detailed_usage.rst:197), which does not match the integral of
    # exp(-himmelblau) over this box; we test against the true value.
    # Round 3 tightened 0.8 -> 0.2: mode-balanced acquisition + the
    # final-precision NS give measured multi-seed scatter <= 0.076 (the
    # round-2 floor was per-mode surrogate imbalance + NS sampler noise).
    assert abs(logz["mean"] - (-5.504)) < 0.2, f"logZ {logz['mean']}"
    # output artifacts exist
    import os

    base = os.path.join(str(tmp_path), "himmelblau_test")
    for suffix in ("_results.pkl", ".txt", ".paramnames", ".ranges",
                   "_stats.json", "_timing.json", "_intermediate.json"):
        assert os.path.exists(base + suffix), f"missing {suffix}"


def test_bobe_clf_path(tmp_path):
    def gaussian_with_failures(x):
        if x[0] > 4.0:
            return np.nan  # failure region -> minus_inf via Likelihood
        return -0.5 * float(np.sum(((x - 1.0) / 0.8) ** 2))

    bounds = np.array([[-5.0, 5.0], [-5.0, 5.0]]).T
    bobe = BOBE(
        loglikelihood=gaussian_with_failures,
        param_list=["x1", "x2"],
        param_bounds=bounds,
        likelihood_name="clf_test",
        n_sobol_init=24,
        seed=7,
        use_clf=True,
        clf_type="svm",
        save_dir=str(tmp_path),
        verbosity="WARNING",
        pool="serial",
    )
    results = bobe.run(acq="wipstd", min_evals=28, max_evals=60,
                       max_gp_size=90, logz_threshold=1.0,
                       convergence_n_iters=1, fit_n_points=8, batch_size=4,
                       ns_n_points=8, mc_points_method="uniform",
                       mc_points_size=64)
    assert results is not None
    from bobe_tpu.models.clf_gp import GPwithClassifier

    assert isinstance(results["gp"], GPwithClassifier)
    assert results["best_val"] > -5.0


def test_budget_capped_final_ns_boosts_nlive(tmp_path):
    """A run that exhausts its budget WITHOUT converging must still report a
    final dynamic-NS evidence with the nlive boost applied (bo.py: the
    budget-capped branch mirrors the post-convergence precision pass)."""
    loglike, bounds, logz_true = toys.make_gaussian(2, sigma=0.15)
    bobe = BOBE(
        loglikelihood=loglike,
        param_list=["a", "b"],
        param_bounds=bounds,
        likelihood_name="capped_test",
        n_sobol_init=16,
        seed=5,
        save=False,
        verbosity="WARNING",
        pool="serial",
    )
    results = bobe.run(acq="wipstd", min_evals=16, max_evals=24,
                       max_gp_size=24, logz_threshold=1e-4,
                       convergence_n_iters=3, fit_n_points=4, batch_size=4,
                       ns_n_points=4, mc_points_size=64, do_final_ns=True)
    assert results is not None
    assert results["termination_reason"] in ("Maximum evaluations reached",
                                             "Maximum GP size reached")
    logz = results["logz"]
    assert np.isfinite(logz["mean"])
    # tiny budget, easy target: the surrogate should still be decent
    assert abs(logz["mean"] - logz_true) < 1.0, (logz, logz_true)
    assert len(results["samples"]["x"]) > 0


def test_final_precision_ns_merges_convergence_run(tmp_path, monkeypatch):
    """The post-convergence final-precision NS must pass the convergence
    run's raw dead points via merge_with (same GP state — the reported
    evidence uses all NS work, not a fresh-noise replacement)."""
    import bobe_tpu.bo as bo_mod

    calls = []
    orig = bo_mod.nested_sampling

    def recording(*args, **kwargs):
        calls.append({"nlive": kwargs.get("nlive"),
                      "n_runs": kwargs.get("n_runs", 1),
                      "merged": kwargs.get("merge_with") is not None})
        return orig(*args, **kwargs)

    monkeypatch.setattr(bo_mod, "nested_sampling", recording)

    bobe = BOBE(
        loglikelihood=toys.banana,
        param_list=toys.banana_names,
        param_bounds=toys.banana_bounds,
        likelihood_name="banana_merge_test",
        n_sobol_init=8,
        seed=7,
        save_dir=str(tmp_path),
        verbosity="WARNING",
        pool="serial",
    )
    # threshold 0.05 < the d=2/nlive=500 sampler noise (~0.09) so the
    # final-precision boost pass must engage after convergence
    results = bobe.run(acq="wipstd", min_evals=16, max_evals=160,
                       max_gp_size=200, logz_threshold=0.05, batch_size=4,
                       fit_n_points=4, ns_n_points=8, convergence_n_iters=1)
    assert results is not None
    assert bobe.converged, bobe.termination_reason
    # at least one convergence NS (unmerged) followed by the
    # final-precision pass carrying merge_with and repeat-merged base-nlive
    # runs (n_runs >= 2, NOT a boosted nlive: a boosted nlive is a new static
    # shape whose NS mega-graph recompile costs minutes on relay TPUs)
    assert any(not c["merged"] and c["nlive"] is None for c in calls)
    final = calls[-1]
    assert final["merged"] and final["n_runs"] >= 2
    assert final["nlive"] is None
    assert abs(results["logz"]["mean"] - (-3.185)) < 0.3


def test_overlapped_refresh_parity(tmp_path, monkeypatch):
    """The async (overlapped) MC-pool refresh must run on WIP iterations,
    never on NS iterations, and converge to the same evidence (within NS
    scatter) as the sequential path."""
    import bobe_tpu.bo as bo_mod

    def run_once(overlap):
        monkeypatch.setenv("BOBE_TPU_OVERLAP_REFRESH", "1" if overlap else "0")
        bobe = BOBE(
            loglikelihood=toys.banana,
            param_list=toys.banana_names,
            param_bounds=toys.banana_bounds,
            likelihood_name=f"banana_overlap_{int(overlap)}",
            n_sobol_init=8, seed=11, save_dir=str(tmp_path),
            verbosity="WARNING", pool="serial")
        results = bobe.run(acq="wipstd", min_evals=16, max_evals=160,
                           max_gp_size=200, logz_threshold=0.1, batch_size=4,
                           fit_n_points=4, ns_n_points=8,
                           convergence_n_iters=1)
        timing = bobe.results_manager.get_timing_summary()["phase_times"]
        return results["logz"]["mean"], bobe.converged, timing

    lz_seq, conv_seq, t_seq = run_once(False)
    lz_ovl, conv_ovl, t_ovl = run_once(True)
    assert conv_seq and conv_ovl
    assert "MCMC Join Wait" not in t_seq          # sequential path: no joins
    assert t_ovl.get("MCMC Join Wait", 0.0) >= 0  # overlapped path joined
    assert "MCMC Join Wait" in t_ovl
    # same truth, independent NS noise: both near -3.185 and near each other
    assert abs(lz_seq - (-3.185)) < 0.3
    assert abs(lz_ovl - (-3.185)) < 0.3
