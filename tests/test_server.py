"""Persistent device-server tests (bobe_tpu/server.py, client.py).

The server owns the JAX runtime and keeps loaded executables warm across
runs; clients keep their likelihood callables and serve evaluation
callbacks. These tests run a real server SUBPROCESS (CPU backend) against
real client runs and assert:
  * protocol liveness (ping / runs_served / shutdown),
  * end-to-end parity with an identical in-process run (same seed, same
    code path server-side, so the EI trajectory must match exactly),
  * likelihood callbacks route through the CLIENT process,
  * server-side failures propagate as client exceptions, not hangs.

No reference counterpart (the reference is CPU-only with no cold-start
problem); motivated by the measured relay-side executable-load wall
(BENCH_NOTES round 4).
"""
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from bobe_tpu import client as bclient

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def server_socket(tmp_path_factory):
    base = tmp_path_factory.mktemp("srv")
    sock = str(base / "bobe.sock")
    env = dict(os.environ)
    env["BOBE_TPU_SERVER_ROLE"] = "server"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # server output goes to a FILE: an undrained PIPE deadlocks the server
    # once the XLA cache-loader's (very verbose) stderr fills the buffer
    logf = open(base / "server.log", "w+")
    proc = subprocess.Popen(
        [sys.executable, "-m", "bobe_tpu.server", "--socket", sock,
         "--idle-timeout", "600", "--platform", "cpu"],
        env=env, cwd=REPO, stdout=logf, stderr=subprocess.STDOUT, text=True)
    t0 = time.time()
    while bclient.ping(sock) is None:
        if proc.poll() is not None:
            logf.seek(0)
            pytest.fail(f"server died at boot:\n{logf.read()[-4000:]}")
        if time.time() - t0 > 120:
            proc.kill()
            pytest.fail("server did not come up in 120 s")
        time.sleep(0.5)
    yield sock
    bclient.shutdown(sock)
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()
    logf.close()


def _ei_run(tmp_path, server=None):
    from bobe_tpu.bo import BOBE
    from bobe_tpu.models import toys

    bobe = BOBE(
        loglikelihood=toys.rosenbrock,
        param_list=toys.rosenbrock_names,
        param_bounds=toys.rosenbrock_bounds,
        likelihood_name="rosenbrock_srv",
        n_sobol_init=8, seed=3, save=False, save_dir=str(tmp_path),
        verbosity="WARNING", pool="serial", server=server)
    return bobe.run(acq="logei", max_evals=12, max_gp_size=40,
                    ei_goal=1e-8, convergence_n_iters=1, fit_n_points=4)


def test_ping(server_socket):
    pong = bclient.ping(server_socket)
    assert pong is not None and pong["op"] == "pong"
    assert isinstance(pong["pid"], int)


def test_ei_run_parity_and_counts(server_socket, tmp_path):
    # count likelihood callbacks client-side by wrapping the pool later;
    # here rely on results parity: the server executes the IDENTICAL code
    # with the identical seed, and every likelihood value comes from THIS
    # process, so the EI trajectory must match the in-process run exactly.
    res_srv = _ei_run(tmp_path / "srv", server=server_socket)
    res_loc = _ei_run(tmp_path / "loc", server=None)
    assert res_srv is not None and res_loc is not None
    for key in ("gp", "likelihood", "results_manager", "best_val", "best_pt",
                "logz", "termination_reason", "samples"):
        assert key in res_srv
    assert res_srv["samples"] == {}  # EI produces no samples (reference)
    assert res_srv["logz"] == {}
    np.testing.assert_allclose(res_srv["best_val"], res_loc["best_val"],
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(res_srv["best_pt"]),
                               np.asarray(res_loc["best_pt"]), rtol=1e-8)
    # the GP comes back reconstructed from the server's state dict
    assert res_srv["gp"] is not None
    assert int(res_srv["gp"].npoints) == int(res_loc["gp"].npoints)
    xs = np.linspace(0.1, 0.9, 5)[:, None] * np.ones((5, 2))
    np.testing.assert_allclose(
        np.asarray(res_srv["gp"].predict_mean_batched(xs)),
        np.asarray(res_loc["gp"].predict_mean_batched(xs)), rtol=1e-8)
    # two runs served so far (this test ran one server run; ping reports
    # cumulative count >= 1)
    pong = bclient.ping(server_socket)
    assert pong["runs_served"] >= 1


def test_run_error_propagates(server_socket, tmp_path):
    from bobe_tpu.bo import BOBE
    from bobe_tpu.models import toys

    bobe = BOBE(
        loglikelihood=toys.rosenbrock,
        param_list=toys.rosenbrock_names,
        param_bounds=toys.rosenbrock_bounds,
        n_sobol_init=8, seed=3, save=False, save_dir=str(tmp_path),
        verbosity="WARNING", pool="serial", server=server_socket)
    with pytest.raises(RuntimeError, match="device-server run failed"):
        bobe.run(acq="not_an_acquisition", max_evals=8)
    # server survives a failed run
    assert bclient.ping(server_socket) is not None


def test_client_evaluates_likelihood_locally(server_socket, tmp_path):
    """The user callable executes in THIS process: a closure counter ticks."""
    from bobe_tpu.bo import BOBE

    calls = {"n": 0}

    def quad(x):
        calls["n"] += 1
        return -float(np.sum((np.asarray(x) - 0.3) ** 2)) * 20.0

    bobe = BOBE(
        loglikelihood=quad, param_list=["a", "b"],
        param_bounds=np.array([[0.0, 0.0], [1.0, 1.0]]),
        n_sobol_init=8, seed=7, save=False, save_dir=str(tmp_path),
        verbosity="WARNING", pool="serial", server=server_socket)
    res = bobe.run(acq="logei", max_evals=10, max_gp_size=32, ei_goal=1e-8,
                   fit_n_points=4)
    assert calls["n"] >= 10  # init + BO evaluations all came through here
    assert res["best_val"] > -20.0


def test_ensure_server_rejects_missing_without_spawn(tmp_path):
    with pytest.raises(RuntimeError, match="auto-spawn disabled"):
        bclient.ensure_server(str(tmp_path / "nope.sock"), spawn=False)
