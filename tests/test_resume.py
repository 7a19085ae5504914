"""Checkpoint/resume end-to-end: a run's state survives a restart and the
resume short-circuit respects the convergence threshold (reference
bo.py:327-381, 1047-1078)."""
import numpy as np
import pytest

from bobe_tpu.bo import BOBE
from bobe_tpu.models import toys


def test_resume_restores_gp_and_history(tmp_path):
    kwargs = dict(
        loglikelihood=toys.rosenbrock,
        param_list=toys.rosenbrock_names,
        param_bounds=toys.rosenbrock_bounds,
        likelihood_name="resume_test",
        n_sobol_init=8,
        seed=11,
        save_dir=str(tmp_path),
        verbosity="WARNING",
        pool="serial",
    )
    bobe = BOBE(**kwargs)
    r1 = bobe.run(acq="logei", max_evals=12, max_gp_size=40, ei_goal=1e-12,
                  convergence_n_iters=1, fit_n_points=4)
    n1 = r1["gp"].npoints
    it1 = r1["results_manager"].get_last_iteration()
    assert n1 >= 10

    # restart from the saved artifacts
    bobe2 = BOBE(resume=True, resume_file=f"{tmp_path}/resume_test", **kwargs)
    assert not bobe2.fresh_start
    assert bobe2.gp.npoints == n1
    assert bobe2.start_iteration == it1
    # continue for a couple more evaluations
    r2 = bobe2.run(acq="logei", max_evals=n1 + 4, max_gp_size=40,
                   ei_goal=1e-12, convergence_n_iters=1, fit_n_points=4)
    assert r2["gp"].npoints >= n1
    assert r2["results_manager"].get_last_iteration() >= it1


def test_resume_without_explicit_file_uses_save_path(tmp_path):
    """resume=True with the default resume_file=None must resume from the
    run's own save path (it used to fall through both init branches and
    crash with self.gp never created)."""
    kwargs = dict(
        loglikelihood=toys.rosenbrock,
        param_list=toys.rosenbrock_names,
        param_bounds=toys.rosenbrock_bounds,
        likelihood_name="resume_default",
        n_sobol_init=8,
        seed=7,
        save_dir=str(tmp_path),
        verbosity="WARNING",
        pool="serial",
    )
    bobe = BOBE(**kwargs)
    r1 = bobe.run(acq="logei", max_evals=10, max_gp_size=40, ei_goal=1e-12,
                  convergence_n_iters=1, fit_n_points=4)
    n1 = r1["gp"].npoints

    bobe2 = BOBE(resume=True, **kwargs)  # no resume_file
    assert not bobe2.fresh_start
    assert bobe2.gp.npoints == n1


def _make_minimal_bobe(tmp_path, name):
    """A constructed-but-not-run BOBE with the run-time attributes
    check_convergence_logz needs, for targeted convergence-bookkeeping
    tests (reference bo.py:869-961)."""
    bobe = BOBE(
        loglikelihood=toys.rosenbrock,
        param_list=toys.rosenbrock_names,
        param_bounds=toys.rosenbrock_bounds,
        likelihood_name=name,
        n_sobol_init=8,
        seed=5,
        save_dir=str(tmp_path),
        verbosity="WARNING",
        pool="serial",
    )
    bobe.logz_threshold = 0.1
    bobe.convergence_n_iters = 3
    bobe.convergence_counter = 0
    bobe.min_delta_seen = np.inf
    bobe.prev_samples = None
    return bobe


def test_counter_in_progress_convergence_is_not_persisted(tmp_path):
    """A delta<threshold check that has NOT yet met convergence_n_iters
    successive passes must record converged=False — the raw pre-counter
    flag used to be persisted, so a crash at counter 1/3 resumed as
    'already converged'."""
    bobe = _make_minimal_bobe(tmp_path, "ckpt_counter")
    rng = np.random.default_rng(0)
    eq = rng.uniform(0.2, 0.8, size=(64, 2))
    logl = -np.sum((eq - 0.5) ** 2, axis=1)
    logz_dict = {"mean": -1.0, "upper": -0.98, "lower": -1.02, "std": 0.01}
    converged = bobe.check_convergence_logz(1, logz_dict, eq, logl,
                                            save_checkpoint=False)
    assert converged is False  # 1/3 successive checks
    assert bobe.convergence_counter == 1
    info = bobe.results_manager.convergence_history[-1]
    assert info.converged is False
    assert bobe.results_manager.converged is False
    # the third successive pass flips both the return and the record
    bobe.check_convergence_logz(2, logz_dict, eq, logl, save_checkpoint=False)
    converged = bobe.check_convergence_logz(3, logz_dict, eq, logl,
                                            save_checkpoint=False)
    assert converged is True
    assert bobe.results_manager.convergence_history[-1].converged is True


def test_checkpoint_chains_are_physical_space(tmp_path):
    """Checkpoint chain files must be written in PHYSICAL coordinates: the
    .ranges file is physical and resume loads the checkpoint chain back as
    the final posterior (results.py loads <base>_checkpoint.txt)."""
    bobe = _make_minimal_bobe(tmp_path, "ckpt_coords")
    rng = np.random.default_rng(1)
    unit_x = rng.uniform(0.0, 1.0, size=(64, 2))
    logl = -np.sum((unit_x - 0.5) ** 2, axis=1)
    bobe.ns_samples = {"x": unit_x, "logl": logl,
                       "weights": np.full(64, 1.0 / 64)}
    # not converged (counter 1/3) -> the checkpoint branch runs
    logz_dict = {"mean": -1.0, "upper": -0.98, "lower": -1.02, "std": 0.01}
    eq = unit_x.copy()
    bobe.check_convergence_logz(1, logz_dict, eq, logl, save_checkpoint=True)
    chain = np.loadtxt(f"{tmp_path}/ckpt_coords_checkpoint.txt")
    x_saved = chain[:, 2:]
    bounds = np.asarray(toys.rosenbrock_bounds, dtype=float)
    expected = bounds[0] + unit_x * (bounds[1] - bounds[0])
    np.testing.assert_allclose(x_saved, expected, rtol=1e-6)
    # and the in-memory NS dict stays unit-cube (the live loop depends on it)
    assert bobe.ns_samples["x"].max() <= 1.0
