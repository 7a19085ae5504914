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
