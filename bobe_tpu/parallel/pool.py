"""Evaluation pools: the host-side runtime for expensive true likelihoods.

The reference's entire distributed runtime is an mpi4py master-worker task
farm (/root/reference/BOBE/pool.py). In the TPU-native design the roles split:

* GP math (fits, acquisition, samplers) runs on the accelerator with vmapped
  restarts and sharded batches — the MPI restart farm (pool.py:239-328) has no
  equivalent here because the device replaces it outright.
* True-likelihood evaluations are inherently host-side (Cobaya/theory codes on
  CPU). They go through an ``EvalPool``:
    - SerialPool: in-process loop (the reference's size==1 fallback).
    - MultiprocessPool: fork-based worker pool on one host with dynamic
      scheduling, preserving result order and fail-fast error propagation
      (the semantics of pool.py:143-206).
    - DistributedPool: multi-host via jax.distributed — rank 0 orchestrates;
      every rank evaluates a round-robin shard of each batch and results are
      combined with an all-gather over the process group (compiler-level
      collectives replace mpi4py point-to-point).

All pools share the reference's per-rank seed-offset convention (pool.py:81-83)
via utils/seed.set_global_seed(rank_offset=True).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils.log import get_logger
from ..utils.seed import get_numpy_rng

log = get_logger("pool")


class EvalPool:
    """Interface; also usable directly as the serial pool."""

    size: int = 1

    @property
    def is_main_process(self) -> bool:
        return True

    @property
    def is_mpi(self) -> bool:  # kept for reference API familiarity
        return False

    @property
    def is_distributed(self) -> bool:
        return self.size > 1

    def run_map_objective(self, likelihood, points) -> np.ndarray:
        """Evaluate likelihood at each point (n, d) -> (n,) in order."""
        raise NotImplementedError

    def get_cobaya_initial_points(self, likelihood, n_points: int, rng=None
                                  ) -> List[Tuple]:
        """Draw n valid points from the Cobaya reference distribution."""
        raise NotImplementedError

    def gp_fit(self, gp, n_restarts=8, maxiters=500, rng=None):
        """Hyperparameter fit. On-device vmapped restarts — the pool exists
        only for API familiarity (reference pool.py:239; its ``use_pool``
        flag has no equivalent here because the device replaces the MPI
        restart farm outright)."""
        return gp.fit(n_restarts=n_restarts, maxiter=maxiters, rng=rng)

    def clear_jax_caches(self):
        """No-op: padded static shapes make the reference's per-iteration
        cache purge (pool.py:365, bo.py:1336) unnecessary."""

    def close(self):
        pass


class SerialPool(EvalPool):
    """In-process evaluation (reference pool.py serial fallback :37-51)."""

    def run_map_objective(self, likelihood, points) -> np.ndarray:
        points = np.atleast_2d(np.asarray(points))
        return np.asarray([likelihood(p) for p in points], dtype=np.float64)

    def get_cobaya_initial_points(self, likelihood, n_points, rng=None):
        rng = rng if rng is not None else get_numpy_rng()
        return [likelihood._get_single_valid_point(rng) for _ in range(n_points)]


# --------------------------------------------------------------------------
# single-host multiprocessing
# --------------------------------------------------------------------------

_WORKER_LIKELIHOOD = None


def _mp_init(payload, base_seed):
    global _WORKER_LIKELIHOOD
    # Likelihood workers are host-only by contract (mirrors the reference,
    # where MPI workers only ever call the user likelihood — pool.py's
    # workers never touch the surrogate). Pin them to the CPU backend BEFORE
    # anything can initialize a jax platform: a worker inheriting
    # JAX_PLATFORMS pointing at an accelerator would race the orchestrator
    # for the chip (TPU runtimes are single-process per chip; on
    # tunneled/remote-attached TPUs the second client blocks indefinitely,
    # deadlocking the whole pool). Override with BOBE_TPU_WORKER_PLATFORM
    # (set to empty to inherit the ambient platform selection).
    platform = os.environ.get("BOBE_TPU_WORKER_PLATFORM", "cpu")
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        try:
            import jax

            jax.config.update("jax_platforms", platform)
        except Exception:  # pragma: no cover - backend already initialized
            pass
    if isinstance(payload, bytes):  # cloudpickle transport (spawn/forkserver)
        import cloudpickle

        payload = cloudpickle.loads(payload)
    _WORKER_LIKELIHOOD = payload
    from ..utils import seed as seed_mod

    if base_seed is not None:
        seed_mod.set_global_seed(base_seed + os.getpid() % 10000, rank_offset=False)


def _mp_eval(args):
    idx, point = args
    return idx, _WORKER_LIKELIHOOD(point)


def _mp_cobaya_point(seed_i):
    rng = np.random.default_rng(seed_i)
    return _WORKER_LIKELIHOOD._get_single_valid_point(rng)


class MultiprocessPool(EvalPool):
    """Worker-process pool for one host.

    Dynamic scheduling comes from multiprocessing's work queue
    (imap_unordered); results are index-tagged to restore order and any worker
    exception propagates to the caller (fail-fast), matching the reference's
    scheduler semantics (pool.py:143-206).

    Workers start via ``forkserver`` by default: forking a process that has
    initialized a JAX backend (always true here — jax is imported at
    interpreter startup) can deadlock on the backend's internal threads, and
    the forkserver's server process never touches a device. Likelihoods are
    shipped to workers with cloudpickle so closures/lambdas survive the
    non-fork start method.

    NOTE: as with any non-fork start method, user scripts must create the
    pool under ``if __name__ == "__main__":`` (standard Python
    multiprocessing requirement; all bundled examples do).
    """

    def __init__(self, n_workers: Optional[int] = None, seed: Optional[int] = None,
                 start_method: str = "forkserver"):
        import multiprocessing as mp

        self._mp = mp.get_context(start_method)
        self.size = n_workers or max(1, os.cpu_count() or 1)
        self._seed = seed
        self._pool = None
        self._likelihood = None

    def _ensure_pool(self, likelihood):
        if self._pool is None or self._likelihood is not likelihood:
            self.close()
            self._likelihood = likelihood
            import cloudpickle

            payload = cloudpickle.dumps(likelihood)
            self._pool = self._mp.Pool(
                self.size, initializer=_mp_init, initargs=(payload, self._seed))

    def run_map_objective(self, likelihood, points) -> np.ndarray:
        points = np.atleast_2d(np.asarray(points))
        if len(points) == 1 or self.size == 1:
            return SerialPool().run_map_objective(likelihood, points)
        self._ensure_pool(likelihood)
        out = np.empty(len(points), dtype=np.float64)
        for idx, val in self._pool.imap_unordered(
                _mp_eval, list(enumerate(points))):
            out[idx] = val
        return out

    def get_cobaya_initial_points(self, likelihood, n_points, rng=None):
        rng = rng if rng is not None else get_numpy_rng()
        seeds = rng.integers(0, 2**31 - 1, size=n_points)
        self._ensure_pool(likelihood)
        return list(self._pool.map(_mp_cobaya_point, seeds))

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None


# --------------------------------------------------------------------------
# multi-host via jax.distributed
# --------------------------------------------------------------------------

class DistributedPool(EvalPool):
    """Multi-host likelihood farm over the jax.distributed process group.

    Every process runs the same program. Rank 0 drives the BO loop; at each
    evaluation point all ranks enter :meth:`run_map_objective` together.
    Control flow rides the process-group collectives (a broadcast header
    announces each task round; an all-gather acts as the round barrier), but
    the WORK distribution is dynamic: rank 0 hosts a TCP task queue
    (multiprocessing.managers, served from a daemon thread) that every rank
    — rank 0 included — pulls from greedily. This reproduces the reference's
    send-one/recv-any scheduler semantics (pool.py:143-206): heterogeneous
    evaluation times (a Cobaya failure returns instantly, a success takes
    ~1 s) load-balance instead of idling every rank at a static-shard
    barrier. If the queue server cannot be set up (restricted sockets), the
    pool falls back to static round-robin sharding + all-gather.

    Worker ranks block in :meth:`worker_loop` between batches. Requires
    ``jax.distributed.initialize()`` to have been called BEFORE constructing
    the pool — by the launching script/test harness (see
    tests/distributed_driver.py), never by bobe_tpu itself: initialize() must
    run before any jax backend use, which user code cannot guarantee by the
    time BOBE is constructed.
    """

    TASK_EVAL, TASK_COBAYA, TASK_EXIT, TASK_EVAL_DYN = 0, 1, 2, 3
    _ADDR_BYTES = 64  # fixed-size wire format: ip(40) + port(4) + authkey(16)
    # class-level defaults so transport-stubbed instances (tests build the
    # pool via __new__) get the static path
    _dyn = False
    _queues = None

    def __init__(self):
        import jax

        self.rank = jax.process_index()
        self.size = jax.process_count()
        self._queues = None
        self._dyn = False
        if self.size > 1:
            self._dyn = self._setup_task_queues()

    # -------------------------------------------------- dynamic task queue

    def _setup_task_queues(self) -> bool:
        """Rank 0 serves task/result queues over TCP; the (ip, port, authkey)
        triple is broadcast over the process group. Returns False (static
        fallback) if serving or connecting fails on any rank."""
        import queue as _queue
        import secrets
        import socket
        import threading
        from multiprocessing.managers import BaseManager

        class _QueueManager(BaseManager):
            pass

        ok = np.zeros(1)
        # The broadcast + the consensus all-gather below are COLLECTIVES:
        # every rank must reach both in the same order no matter which local
        # step fails, or the process group deadlocks. All fallible local work
        # is therefore wrapped per-branch; rank 0 signals failure by
        # broadcasting an all-zero wire (port 0) instead of skipping the
        # broadcast.
        if self.rank == 0:
            wire = np.zeros(self._ADDR_BYTES, dtype=np.uint8)
            try:
                task_q, result_q = _queue.Queue(), _queue.Queue()
                _QueueManager.register("task_q", callable=lambda: task_q)
                _QueueManager.register("result_q", callable=lambda: result_q)
                authkey = secrets.token_bytes(16)
                mgr = _QueueManager(address=("0.0.0.0", 0), authkey=authkey)
                # serve from a thread: forking a jax-initialized process (the
                # BaseManager.start() default) can deadlock on backend threads
                server = mgr.get_server()
                threading.Thread(target=server.serve_forever,
                                 daemon=True).start()
                port = server.address[1]
                try:
                    ip = socket.gethostbyname(socket.gethostname())
                except OSError:
                    ip = "127.0.0.1"
                ip_b = ip.encode()[:40]
                wire[:len(ip_b)] = np.frombuffer(ip_b, dtype=np.uint8)
                wire[40:44] = np.frombuffer(
                    int(port).to_bytes(4, "little"), dtype=np.uint8)
                wire[44:60] = np.frombuffer(authkey, dtype=np.uint8)
                self._queues = (task_q, result_q)
                ok[0] = 1.0
            except Exception as e:
                log.warning(f"task-queue server unavailable ({e}); "
                            "falling back to static sharding")
            self._bcast(wire)
        else:
            wire = self._bcast(np.zeros(self._ADDR_BYTES, dtype=np.uint8))
            port = int.from_bytes(bytes(wire[40:44]), "little")
            if port == 0:
                log.warning("rank 0 reported no task-queue server; "
                            "falling back to static sharding")
            else:
                try:
                    ip = bytes(wire[:40]).rstrip(b"\x00").decode()
                    authkey = bytes(wire[44:60])
                    _QueueManager.register("task_q")
                    _QueueManager.register("result_q")
                    # a worker may land here before rank 0's server thread
                    # is up
                    last = None
                    for host in (ip, "127.0.0.1"):
                        for _ in range(50):
                            try:
                                mgr = _QueueManager(address=(host, port),
                                                    authkey=authkey)
                                mgr.connect()
                                self._queues = (mgr.task_q(), mgr.result_q())
                                ok[0] = 1.0
                                break
                            except (ConnectionError, OSError) as e:
                                last = e
                                import time

                                time.sleep(0.1)
                        if ok[0]:
                            break
                    if not ok[0]:
                        log.warning(f"task-queue connect failed ({last}); "
                                    "falling back to static sharding")
                except Exception as e:
                    log.warning(f"dynamic task queue unavailable ({e}); "
                                "falling back to static sharding")
        # consensus: dynamic only if EVERY rank is wired up
        all_ok = self._allgather_rows(ok)
        return bool(np.all(all_ok == 1.0))

    def _dynamic_round(self, likelihood, points=None):
        """One dynamic evaluation round. Rank 0 passes the batch and gets the
        ordered values back; workers pass None and serve until the sentinel.
        The trailing all-gather is the round barrier (keeps the collective
        protocol aligned across ranks for the NEXT broadcast)."""
        task_q, result_q = self._queues
        n = 0
        if self.rank == 0:
            n = len(points)
            for i, p in enumerate(points):
                task_q.put((i, np.asarray(p)))
            for _ in range(self.size):
                task_q.put(None)
        while True:
            task = task_q.get()
            if task is None:
                break
            i, p = task
            try:
                result_q.put((i, float(likelihood(p)), None))
            except Exception as e:  # pool-level failure (fail-fast, like
                result_q.put((i, np.nan, repr(e)))  # reference pool.py:133)
        out, err = None, None
        if self.rank == 0:
            out = np.full(n, np.nan, dtype=np.float64)
            for _ in range(n):
                i, v, e = result_q.get()
                out[i] = v
                err = err or e
        self._allgather_rows(np.zeros(1))  # round barrier
        if err:
            raise RuntimeError(f"likelihood evaluation failed on a worker: {err}")
        return out

    @property
    def is_main_process(self) -> bool:
        return self.rank == 0

    def _bcast(self, arr):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.broadcast_one_to_all(np.asarray(arr)))

    def _allgather_rows(self, local_rows):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(local_rows))

    def _eval_shard(self, likelihood, points):
        # per-point exceptions become NaN so the all-gather is ALWAYS posted
        # (a raise here would desynchronize the collective protocol and hang
        # every other rank); rank 0 turns the NaN into a fail-fast
        # RuntimeError after the combine, and close()'s EXIT broadcast then
        # releases the workers. Likelihood adapters already map user-level
        # failures to minus_inf (likelihood.py _safe_eval), so a NaN can only
        # mean a pool/likelihood-wrapper bug — fail-fast like the reference
        # (pool.py:133), but without deadlocking the group.
        n = len(points)
        idxs = np.arange(self.rank, n, self.size)
        vals = np.full(n, np.nan, dtype=np.float64)
        for i in idxs:
            try:
                vals[i] = likelihood(points[i])
            except Exception as e:
                log.error(f"likelihood evaluation raised on rank {self.rank} "
                          f"(point {i}): {e!r}")
        return vals

    def run_map_objective(self, likelihood, points) -> np.ndarray:
        # float64 throughout: collectives must post identical shape+dtype
        # buffers on every rank (workers post float64 zeros in worker_loop)
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        if self.size == 1:
            return SerialPool().run_map_objective(likelihood, points)
        if not self.is_main_process:
            # a worker rank calling this directly would post a collective
            # sequence mismatched with rank 0's (no header/points broadcast)
            # and hang the process group — workers must sit in worker_loop
            raise RuntimeError(
                "DistributedPool.run_map_objective is rank-0 only; worker "
                "ranks must block in worker_loop()")
        if self._dyn:
            self._bcast(np.asarray(
                [self.TASK_EVAL_DYN, len(points), points.shape[1]],
                dtype=np.float64))
            return self._dynamic_round(likelihood, points)
        self._bcast(np.asarray([self.TASK_EVAL, len(points), points.shape[1]],
                               dtype=np.float64))
        pts = self._bcast(points)
        local = self._eval_shard(likelihood, pts)
        allv = self._allgather_rows(local)  # (size, n)
        # nan-free combine: each column has exactly one non-nan entry
        cols = ~np.isnan(allv)
        out = allv[np.argmax(cols, axis=0), np.arange(allv.shape[1])]
        if np.isnan(out).any():
            raise RuntimeError(
                "likelihood evaluation failed on a worker rank (see that "
                "rank's log for the exception)")
        return out

    def worker_loop(self, likelihood):
        """Ranks > 0 block here, mirroring worker_wait (pool.py:56-141)."""
        while True:
            header = self._bcast(np.zeros(3))
            task = int(header[0])
            if task == self.TASK_EXIT:
                return
            if task == self.TASK_EVAL_DYN:
                self._dynamic_round(likelihood)
            elif task == self.TASK_EVAL:
                n, d = int(header[1]), int(header[2])
                pts = self._bcast(np.zeros((n, d)))
                local = self._eval_shard(likelihood, pts)
                self._allgather_rows(local)
            elif task == self.TASK_COBAYA:
                n = int(header[1])
                self._cobaya_shard(likelihood, n)

    # reference-API alias (pool.py:56 worker_wait)
    def worker_wait(self, likelihood, seed=None):
        return self.worker_loop(likelihood)

    def _cobaya_shard(self, likelihood, n_points):
        rng = get_numpy_rng()
        idxs = np.arange(self.rank, n_points, self.size)
        d = likelihood.ndim
        pts = np.full((n_points, d), np.nan)
        lps = np.full(n_points, np.nan)
        for i in idxs:
            # per-point exceptions become NaN rows so the allgathers below
            # are ALWAYS posted — a raise here would desynchronize the
            # collective protocol and hang every other rank (same
            # discipline as _eval_shard); rank 0 fail-fasts after the
            # combine in get_cobaya_initial_points, workers just return to
            # worker_loop and are released by the EXIT broadcast
            try:
                pt, lp = likelihood._get_single_valid_point(rng)
                pts[i], lps[i] = pt, lp
            except Exception as e:
                log.error(f"cobaya initial-point draw raised on rank "
                          f"{self.rank} (point {i}): {e!r}")
        allp = self._allgather_rows(pts)
        alll = self._allgather_rows(lps)
        sel = np.argmax(~np.isnan(alll), axis=0)
        return [(allp[sel[i], i], alll[sel[i], i]) for i in range(n_points)]

    def get_cobaya_initial_points(self, likelihood, n_points, rng=None):
        if self.size == 1:
            return SerialPool().get_cobaya_initial_points(likelihood, n_points, rng)
        self._bcast(np.asarray([self.TASK_COBAYA, n_points, 0], dtype=np.float64))
        out = self._cobaya_shard(likelihood, n_points)
        bad = [i for i, (_, lp) in enumerate(out) if np.isnan(lp)]
        if bad:
            raise RuntimeError(
                f"Cobaya initial-point generation failed on every rank for "
                f"point(s) {bad} (see rank logs for the underlying errors)")
        return out

    def close(self):
        # idempotent: run() closes in a finally block AND on its normal exit
        # paths; a second EXIT broadcast would have no worker_loop partner
        # (workers leave the loop at the first one) and hang the group
        if getattr(self, "_closed", False):
            return
        self._closed = True
        if self.size > 1 and self.is_main_process:
            self._bcast(np.asarray([self.TASK_EXIT, 0, 0], dtype=np.float64))


def make_pool(kind: str = "auto", **kwargs) -> EvalPool:
    """Pool factory: 'auto' picks Distributed when a jax process group exists,
    else Serial. 'multiprocess' forces the fork pool."""
    if kind == "serial":
        return SerialPool()
    if kind == "multiprocess":
        return MultiprocessPool(**kwargs)
    if kind == "distributed":
        return DistributedPool()
    # auto
    try:
        import jax

        if jax.process_count() > 1:
            return DistributedPool()
    except Exception:
        pass
    return SerialPool()
