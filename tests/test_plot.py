"""Plotting smoke tests: every diagnostic renders and writes a file."""
import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from bobe_tpu.utils.plot import BOBESummaryPlotter, create_summary_plots, plot_final_samples
from bobe_tpu.utils.results import BOBEResults


@pytest.fixture()
def populated_rm(tmp_path):
    rm = BOBEResults(output_file="plotrun", save_dir=str(tmp_path),
                     param_names=["a", "b"], param_labels=["a", "b"],
                     param_bounds=np.array([[0, 1], [0, 1]]).T,
                     likelihood_name="plot_test")
    for i in range(1, 6):
        rm.update_acquisition(i, 1.0 / i, "WIPStd")
        rm.update_gp_hyperparams(i, [0.5 / i, 0.2 * i], 1.0 + i)
        rm.update_best_loglike(i, -10.0 / i)
        rm.update_convergence(i, {"mean": -1.0 - 0.1 / i, "upper": -1.0,
                                  "lower": -1.2, "var": 0.01, "std": 0.1},
                              i >= 4, 0.1)
        rm.update_kl_divergences(i, {"forward": 0.1 / i, "reverse": 0.2 / i,
                                     "symmetric": 0.15 / i})
    rng = np.random.default_rng(0)
    rm.final_samples = rng.uniform(size=(100, 2))
    rm.final_weights = np.ones(100)
    rm.final_loglikes = rng.normal(size=100)
    rm.start_timing("GP Training")
    rm.end_timing("GP Training")
    return rm


def test_all_plots_render(populated_rm, tmp_path):
    plotter = BOBESummaryPlotter(populated_rm)
    paths = plotter.save_all_plots()
    assert len(paths) == 11, paths
    for p in paths:
        assert os.path.exists(p)


def test_stats_panel(populated_rm):
    populated_rm.converged = True
    populated_rm.termination_reason = "logz_delta"
    populated_rm.final_logz = {"mean": -3.2, "upper": -3.1, "lower": -3.3}
    populated_rm.gp_info = {"gp_training_set_size": 42,
                            "classifier_used": False}
    plotter = BOBESummaryPlotter(populated_rm)
    p = plotter.plot_stats_panel(save=True)
    assert p and os.path.exists(p)


def test_triangle_plot(populated_rm, tmp_path):
    fn = os.path.join(str(tmp_path), "tri.png")
    plot_final_samples(populated_rm, filename=fn)
    assert os.path.exists(fn)


def test_triangle_plot_training_overlay(populated_rm, tmp_path):
    """Training points must be drawn on the off-diagonal panels regardless
    of whether getdist is installed (reference plot.py:50)."""

    class FakeGP:
        train_x = np.random.default_rng(1).uniform(size=(20, 2))

    fig = plot_final_samples(populated_rm, gp=FakeGP(), filename=None,
                             show_training_points=True)
    assert fig is not None
    # find a scatter (PathCollection) with exactly 20 offsets on some axis
    n_overlay = sum(
        1 for ax in fig.axes for coll in ax.collections
        if getattr(coll, "get_offsets", None) is not None
        and len(coll.get_offsets()) == 20)
    assert n_overlay >= 1, "training-point overlay missing"
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_create_summary_plots(populated_rm):
    out = create_summary_plots(populated_rm)
    assert len(out) >= 11
