"""Client side of the persistent device server (see bobe_tpu/server.py).

A user process in client mode keeps its likelihood callable and its own
evaluation pool; the server owns the accelerator and runs the BO loop,
calling likelihood batches back over the socket. Activate by exporting
``BOBE_TPU_SERVER=/path/to.sock`` (any existing BOBE script then routes its
runs through the server unchanged) or by passing ``BOBE(server=...)``.

Auto-spawn: if the socket does not answer a ping, the client starts
``python -m bobe_tpu.server`` itself (with an idle timeout so forgotten
daemons release the accelerator) and waits for it to come up. The first run
against a fresh server pays the usual cold-start once; every later run —
from any number of new client processes — reuses the server's loaded
executables, which is the structural fix for the measured ~350 s of
relay-side first-touch graph loads per process (BENCH_NOTES round 4).
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
from typing import Any, Dict, Optional

import numpy as np

from .server import recv_frame, send_frame
from .utils.log import get_logger

log = get_logger("client")

# default idle timeout for AUTO-spawned servers: long enough to span a
# session of repeated runs, short enough that a forgotten daemon frees the
# accelerator within the hour
_AUTOSPAWN_IDLE_S = 3600.0


def _connect(socket_path: str, timeout_s: float = 10.0) -> socket.socket:
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.settimeout(timeout_s)
    s.connect(socket_path)
    s.settimeout(None)  # runs block indefinitely on server compute
    return s


def ping(socket_path: str, timeout_s: float = 5.0) -> Optional[Dict[str, Any]]:
    """Returns the server's pong payload, or None if unreachable."""
    try:
        with _connect(socket_path, timeout_s) as s:
            send_frame(s, {"op": "ping"})
            rep = recv_frame(s)
            return rep if rep.get("op") == "pong" else None
    except (OSError, ConnectionError, EOFError):
        return None


def shutdown(socket_path: str, timeout_s: float = 10.0) -> bool:
    """Ask the server to exit. Returns True if it acknowledged."""
    try:
        with _connect(socket_path, timeout_s) as s:
            send_frame(s, {"op": "shutdown"})
            return recv_frame(s).get("op") == "bye"
    except (OSError, ConnectionError, EOFError):
        return False


def ensure_server(socket_path: str, spawn: bool = True,
                  boot_timeout_s: float = 900.0,
                  extra_args: Optional[list] = None) -> Dict[str, Any]:
    """Ping the server; spawn one if absent (and ``spawn``). Returns the
    pong payload. Raises RuntimeError if the server cannot be reached.

    Boot can legitimately take minutes on tunneled TPUs (backend init +
    optional prewarm), hence the generous default timeout."""
    pong = ping(socket_path)
    if pong is not None:
        return pong
    if not spawn:
        raise RuntimeError(f"no device server at {socket_path} "
                           f"(auto-spawn disabled)")
    env = dict(os.environ)
    # the child must NOT inherit client mode: it IS the server. Only strip
    # the CPU pin if the package's client-mode guard set it (marker below);
    # a user-exported JAX_PLATFORMS stays honored (tests run CPU servers).
    env.pop("BOBE_TPU_SERVER", None)
    if env.pop("BOBE_TPU_CLIENT_PINNED", None) and \
            env.get("JAX_PLATFORMS") == "cpu":
        env.pop("JAX_PLATFORMS")
    env["BOBE_TPU_SERVER_ROLE"] = "server"
    cmd = [sys.executable, "-m", "bobe_tpu.server", "--socket", socket_path,
           "--idle-timeout", str(_AUTOSPAWN_IDLE_S)] + list(extra_args or [])
    log.info(f"spawning device server: {' '.join(cmd)}")
    # detach: the server must outlive this client, that is its entire point
    subprocess.Popen(cmd, env=env, start_new_session=True,
                     stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    t0 = time.time()
    while time.time() - t0 < boot_timeout_s:
        pong = ping(socket_path)
        if pong is not None:
            log.info(f"device server up (pid {pong.get('pid')}, "
                     f"{time.time() - t0:.1f} s)")
            return pong
        time.sleep(1.0)
    raise RuntimeError(f"device server did not come up on {socket_path} "
                       f"within {boot_timeout_s:.0f} s")


def run_on_server(bobe, run_kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Execute ``bobe.run(**run_kwargs)`` on the device server.

    ``bobe`` is a BOBE facade constructed in client mode (bo.py): it holds
    the local Likelihood + pool and the captured init kwargs. Serves
    likelihood callbacks until the server reports done, then rebuilds a
    results dict shaped like the in-process one (the GP is reconstructed
    from its state dict; results_manager is reloadable from the save path)."""
    sock_path = bobe._server_socket
    ensure_server(sock_path, spawn=bobe._server_autospawn)
    likelihood, pool = bobe.loglikelihood, bobe.pool
    req = {
        "op": "run",
        "init": bobe._server_init,
        "run": dict(run_kwargs),
        # forward this process's runtime knobs so `BOBE_TPU_X=... script.py`
        # behaves identically with and without a server (topology keys and
        # import-time policies excluded — server.py ENV_TOPOLOGY_KEYS)
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("BOBE_TPU_")},
        "likelihood": {
            "param_list": list(likelihood.param_list),
            "param_bounds": np.asarray(likelihood.param_bounds),
            "param_labels": list(likelihood.param_labels),
            "name": likelihood.name,
            "minus_inf": float(likelihood.minus_inf),
        },
    }
    with _connect(sock_path) as s:
        send_frame(s, req)
        while True:
            msg = recv_frame(s)
            op = msg.get("op")
            if op == "eval":
                try:
                    vals = pool.run_map_objective(likelihood, msg["points"])
                    send_frame(s, {"op": "eval_result",
                                   "values": np.asarray(vals)})
                except Exception:
                    import traceback

                    send_frame(s, {"op": "eval_result", "values": None,
                                   "error": traceback.format_exc()})
            elif op == "cobaya_points":
                try:
                    pts = pool.get_cobaya_initial_points(likelihood,
                                                         msg["n"])
                    send_frame(s, {"op": "cobaya_points_result",
                                   "points": pts})
                except Exception:
                    import traceback

                    send_frame(s, {"op": "cobaya_points_result",
                                   "points": None,
                                   "error": traceback.format_exc()})
            elif op == "done":
                return _rebuild_results(bobe, msg["results"])
            elif op == "error":
                raise RuntimeError("device-server run failed:\n"
                                   + msg.get("traceback", "<no traceback>"))
            else:
                raise RuntimeError(f"protocol error: unexpected op {op!r}")


def _rebuild_results(bobe, wire: Dict[str, Any]) -> Dict[str, Any]:
    """Client-side results dict with the same keys as an in-process run."""
    gp = None
    if wire.get("gp_state") is not None:
        if wire.get("gp_class") == "GPwithClassifier":
            from .models.clf_gp import GPwithClassifier as cls
        else:
            from .models.gp import GP as cls
        try:
            gp = cls.from_state_dict(wire["gp_state"])
        except Exception as e:
            log.warning(f"could not rebuild GP from server state: {e!r}")
    results = {
        "gp": gp,
        "likelihood": bobe.loglikelihood,
        "results_manager": None,  # reloadable from save_path artifacts
        "best_val": wire.get("best_val"),
        "best_pt": wire.get("best_pt"),
        "logz": wire.get("logz", {}),
        "termination_reason": wire.get("termination_reason"),
        "samples": wire.get("samples", {}),
        "save_path": wire.get("save_path"),
    }
    bobe.results_dict = results
    bobe.samples_dict = results["samples"]
    bobe.gp = gp
    return results
