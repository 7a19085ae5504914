"""Persistent device server: keep the JAX runtime and loaded executables warm
across BOBE runs.

Why this exists (TPU deployment, no reference counterpart)
----------------------------------------------------------
On tunneled/relay-attached TPUs the dominant cold-start cost is not XLA
compilation but *executable loading*: round 4 measured ~350 s of serial
relay-side compile-cache loads across the ~12 first-touch mega-graphs of the
banana quickstart, against ~28 s of actual run (BENCH_NOTES round 4,
"Cold-start measurement"). Persistent compilation caches and threaded
prewarming cannot remove that wall — the loads are relay-side and serialized
on the single client channel. The structural fix is to pay it once: a
long-lived *device server* process owns the JAX client and its loaded
executables, and successive runs — from any number of short-lived user
processes — reuse them. The reference (pure CPU, local PJRT) has no
equivalent problem and no equivalent component; this module is TPU
deployment infrastructure, analogous to a serving daemon.

Architecture
------------
* The server owns the accelerator and runs the full BO orchestration
  (`bobe_tpu.bo.BOBE`) per request. Nothing algorithmic changes: a run on
  the server is the same code path as a local run.
* The *user's likelihood never crosses the wire as code*. The client keeps
  its callable; the server evaluates batches by RPC-ing the points back to
  the client (`_CallbackPool`), which maps them over its own local pool.
  This preserves the reference's master/worker split (SURVEY §2 #10) with
  the roles inverted: device math centralizes, likelihood evaluation stays
  with the user process.
* Transport: length-prefixed pickle frames over a Unix-domain socket.
  Same-host, same-user only — the socket inherits the creating user's
  permissions and pickle is not safe across trust boundaries; anyone who
  can write to the socket can already run code as this user.
* One run at a time (the accelerator is serial anyway); additional clients
  queue in the listen backlog.

Usage::

    # terminal 1 (or auto-spawned by the client, see bobe_tpu.client)
    python -m bobe_tpu.server --socket /tmp/bobe_tpu.sock --prewarm-d 2

    # terminal 2..n — any BOBE script, unchanged, plus one env var:
    BOBE_TPU_SERVER=/tmp/bobe_tpu.sock python examples/quickstart_banana.py

Client processes detect ``BOBE_TPU_SERVER`` at import and pin themselves to
the CPU backend so the server keeps exclusive ownership of the accelerator
(see bobe_tpu/__init__.py). A manually-started server must NOT have
``BOBE_TPU_SERVER`` exported (or must set ``BOBE_TPU_SERVER_ROLE=server``),
otherwise the same guard would pin the server itself to CPU; ``serve()``
refuses to start in that state rather than silently serving CPU math.
"""
from __future__ import annotations

import argparse
import os
import pickle
import socket
import struct
import sys
import time
import traceback
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

_LEN = struct.Struct(">Q")
# protocol hygiene: a corrupted length prefix must fail fast, not attempt a
# multi-GB allocation. 1 GiB comfortably bounds any legitimate frame (the
# largest are NS sample payloads, tens of MB).
_MAX_FRAME = 1 << 30


def send_frame(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_LEN.pack(len(data)) + data)


def recv_frame(sock: socket.socket) -> Any:
    header = _recv_exact(sock, _LEN.size)
    (n,) = _LEN.unpack(header)
    if n > _MAX_FRAME:
        raise ConnectionError(f"frame length {n} exceeds the {_MAX_FRAME} cap")
    return pickle.loads(_recv_exact(sock, n))


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf.extend(chunk)
    return bytes(buf)


class _CallbackPool:
    """EvalPool that evaluates likelihood batches on the CLIENT.

    Implements the EvalPool surface BOBE uses (run_map_objective,
    get_cobaya_initial_points, gp_fit, clear_jax_caches, close) without
    subclassing to keep this module importable before the heavy package
    import in serve(). Batches cross the socket once each way, so the
    client's own pool (serial / multiprocess) parallelizes member points
    exactly as it would locally.
    """

    size = 1
    is_main_process = True
    is_mpi = False
    is_distributed = False

    def __init__(self, conn: socket.socket):
        self._conn = conn

    def run_map_objective(self, likelihood, points) -> np.ndarray:
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        send_frame(self._conn, {"op": "eval", "points": points})
        rep = recv_frame(self._conn)
        if rep.get("op") != "eval_result":
            raise RuntimeError(f"protocol error: expected eval_result, "
                               f"got {rep.get('op')!r}")
        if rep.get("error"):
            raise RuntimeError("client-side likelihood evaluation failed:\n"
                               + rep["error"])
        vals = np.asarray(rep["values"], dtype=np.float64).reshape(-1)
        if vals.shape[0] != points.shape[0]:
            raise RuntimeError(f"client returned {vals.shape[0]} values for "
                               f"{points.shape[0]} points")
        return vals

    def get_cobaya_initial_points(self, likelihood, n_points: int, rng=None
                                  ) -> List[Tuple]:
        send_frame(self._conn, {"op": "cobaya_points", "n": int(n_points)})
        rep = recv_frame(self._conn)
        if rep.get("op") != "cobaya_points_result":
            raise RuntimeError(f"protocol error: expected "
                               f"cobaya_points_result, got {rep.get('op')!r}")
        if rep.get("error"):
            raise RuntimeError("client-side initial-point draw failed:\n"
                               + rep["error"])
        return rep["points"]

    def gp_fit(self, gp, n_restarts=8, maxiters=500, rng=None):
        return gp.fit(n_restarts=n_restarts, maxiter=maxiters, rng=rng)

    def clear_jax_caches(self):
        pass

    def close(self):
        pass


def _sanitize_results(bobe) -> Dict[str, Any]:
    """The wire form of a finished run: plain data + the GP state dict.

    The in-process results_dict holds live objects (GP, Likelihood,
    BOBEResults); the client reconstructs the GP from its state dict and
    substitutes its own local likelihood (bobe_tpu/client.py)."""
    res = bobe.results_dict or {}
    out = {
        "logz": res.get("logz", {}),
        "samples": res.get("samples", {}),
        "best_val": res.get("best_val"),
        "best_pt": (np.asarray(res["best_pt"])
                    if res.get("best_pt") is not None else None),
        "termination_reason": res.get("termination_reason"),
        "gp_class": type(bobe.gp).__name__ if bobe.gp is not None else None,
        "gp_state": bobe.gp.state_dict() if bobe.gp is not None else None,
        "save_path": getattr(bobe, "save_path", None),
    }
    return out


# env keys that define the server/client topology itself — never forwarded
ENV_TOPOLOGY_KEYS = frozenset({
    "BOBE_TPU_SERVER", "BOBE_TPU_SERVER_ROLE", "BOBE_TPU_CLIENT_PINNED",
    "BOBE_TPU_SERVER_IDLE_S", "BOBE_TPU_SERVER_SOCKET",
    "BOBE_TPU_SERVER_AUTOSPAWN",
})


def _do_run(conn: socket.socket, req: Dict[str, Any]) -> None:
    # heavy imports deferred so `--help`/module import stay instant
    from .bo import BOBE
    from .likelihood import Likelihood

    # Apply the CLIENT's BOBE_TPU_* runtime knobs for the duration of this
    # run (fit policy caps, NS speculation/boost, predict chunking, ... are
    # read from os.environ per call). Import-time policies — dtype, compile
    # cache location — follow the SERVER's environment and are documented
    # as such. Restored in the finally below so runs cannot leak knobs into
    # each other.
    saved_env: Dict[str, Optional[str]] = {}
    for k, v in (req.get("env") or {}).items():
        if not k.startswith("BOBE_TPU_") or k in ENV_TOPOLOGY_KEYS:
            continue
        saved_env[k] = os.environ.get(k)
        os.environ[k] = str(v)

    lik_meta = req["likelihood"]
    pool = _CallbackPool(conn)

    def _proxy_single(x):
        # direct Likelihood.__call__ path (rare: BOBE evaluates through the
        # pool); a one-point batch over the same RPC keeps semantics aligned
        return float(pool.run_map_objective(None, np.asarray(x)[None, :])[0])

    likelihood = Likelihood(
        _proxy_single,
        param_list=lik_meta["param_list"],
        param_bounds=np.asarray(lik_meta["param_bounds"]),
        param_labels=lik_meta.get("param_labels"),
        name=lik_meta.get("name"),
        minus_inf=lik_meta.get("minus_inf", -1e10),
    )
    try:
        init_kwargs = dict(req.get("init", {}))
        run_kwargs = dict(req.get("run", {}))
        bobe = BOBE(loglikelihood=likelihood, pool=pool, **init_kwargs)
        bobe.run(**run_kwargs)
        send_frame(conn, {"op": "done", "results": _sanitize_results(bobe)})
    finally:
        for k, old in saved_env.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old


def _handle(conn: socket.socket, stats: Dict[str, Any]) -> bool:
    """Serve one connection. Returns False when the server should exit."""
    try:
        req = recv_frame(conn)
    except (ConnectionError, EOFError):
        return True
    op = req.get("op")
    if op == "ping":
        send_frame(conn, {"op": "pong", "pid": os.getpid(),
                          "runs_served": stats["runs"],
                          "uptime_s": time.time() - stats["t0"]})
        return True
    if op == "shutdown":
        send_frame(conn, {"op": "bye", "runs_served": stats["runs"]})
        return False
    if op == "run":
        try:
            _do_run(conn, req)
            stats["runs"] += 1
        except (ConnectionError, BrokenPipeError):
            # client vanished mid-run; server stays up for the next one
            pass
        except Exception:
            tb = traceback.format_exc()
            try:
                send_frame(conn, {"op": "error", "traceback": tb})
            except (ConnectionError, BrokenPipeError, OSError):
                pass
        return True
    try:
        send_frame(conn, {"op": "error",
                          "traceback": f"unknown op {op!r}"})
    except (ConnectionError, BrokenPipeError, OSError):
        pass
    return True


def serve(socket_path: str, prewarm_dims: Optional[List[int]] = None,
          prewarm_max_n: int = 256, idle_timeout_s: float = 0.0,
          platform: Optional[str] = None) -> None:
    """Run the device server until shutdown (or idle timeout, if set).

    idle_timeout_s > 0 exits after that many seconds with no connection —
    hygiene for auto-spawned servers so a forgotten daemon cannot hold the
    accelerator forever.

    ``platform``: force a jax platform (e.g. 'cpu' for a test/CI server)
    via jax.config — the reliable mechanism even where a sitecustomize hook
    pre-imports jax and overrides the JAX_PLATFORMS env var.
    """
    if (os.environ.get("BOBE_TPU_SERVER")
            and os.environ.get("BOBE_TPU_SERVER_ROLE") != "server"):
        raise RuntimeError(
            "BOBE_TPU_SERVER is set in this environment, so importing "
            "bobe_tpu pinned this process to the CPU backend (client mode). "
            "Start the server with BOBE_TPU_SERVER unset, or with "
            "BOBE_TPU_SERVER_ROLE=server.")

    # import the package NOW (x64 config, compile cache) and touch the
    # device so backend init cost lands at boot, not on the first request
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)

    import bobe_tpu  # noqa: F401
    from .utils.log import get_logger

    log = get_logger("server")
    devices = jax.devices()
    log.info(f"device server: backend={jax.default_backend()} "
             f"devices={devices}")
    for d in (prewarm_dims or []):
        t0 = time.time()
        try:
            from .utils.prewarm import prewarm_boot_sync

            buckets = prewarm_boot_sync(int(d), max_gp_size=prewarm_max_n)
            log.info(f"boot prewarm d={d}: buckets {buckets} in "
                     f"{time.time() - t0:.1f} s")
        except Exception as e:  # prewarm is best-effort by contract
            log.warning(f"boot prewarm d={d} failed (server still "
                        f"serves): {e!r}")

    sock_dir = os.path.dirname(os.path.abspath(socket_path))
    os.makedirs(sock_dir, exist_ok=True)
    if os.path.exists(socket_path):
        os.unlink(socket_path)  # stale socket from a dead server
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(socket_path)
    os.chmod(socket_path, 0o600)
    srv.listen(8)
    if idle_timeout_s > 0:
        srv.settimeout(idle_timeout_s)
    log.info(f"device server listening on {socket_path} "
             f"(idle timeout {idle_timeout_s or 'none'})")
    stats = {"runs": 0, "t0": time.time()}
    try:
        while True:
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                log.info(f"idle for {idle_timeout_s:.0f} s; exiting "
                         f"({stats['runs']} runs served)")
                break
            # the accepted socket must block indefinitely regardless of the
            # listener's idle timeout (a run legitimately computes for hours
            # between frames)
            conn.settimeout(None)
            with conn:
                if not _handle(conn, stats):
                    log.info(f"shutdown requested "
                             f"({stats['runs']} runs served)")
                    break
    finally:
        srv.close()
        if os.path.exists(socket_path):
            os.unlink(socket_path)


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--socket", default=os.environ.get(
        "BOBE_TPU_SERVER_SOCKET", "/tmp/bobe_tpu.sock"))
    p.add_argument("--prewarm-d", type=int, action="append", default=[],
                   metavar="D", help="warm the standard graph set for "
                   "D-dimensional problems at boot (repeatable)")
    p.add_argument("--prewarm-max-n", type=int, default=256,
                   help="warm capacity buckets up to this GP size")
    p.add_argument("--idle-timeout", type=float, default=float(
        os.environ.get("BOBE_TPU_SERVER_IDLE_S", "0")),
        help="exit after this many idle seconds (0 = never)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for a CI server)")
    args = p.parse_args(argv)
    serve(args.socket, prewarm_dims=args.prewarm_d,
          prewarm_max_n=args.prewarm_max_n,
          idle_timeout_s=args.idle_timeout, platform=args.platform)


if __name__ == "__main__":
    main()
