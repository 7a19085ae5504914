"""Subprocess driver for the real multi-process DistributedPool tests.

Each of the N processes runs this script with its own rank; they form a real
``jax.distributed`` group over localhost (gloo CPU collectives) and drive the
DistributedPool protocol exactly where it can fail: deadlock in the
bcast/allgather rendezvous, mis-ordered shard reassembly, and worker-loop
exit. Mirrors the reference's mpirun-driven test entry
(/root/reference/tests/test_mpi.py:343-347).

Modes:
  pool — two run_map_objective batches of co-prime sizes + close():
         asserts ordered values on rank 0, clean worker exit on ranks > 0.
  hetero — a batch with wildly heterogeneous per-point cost (one slow point,
         many instant ones). With the dynamic task queue the slow point pins
         ONE rank while the others drain the rest, so the round completes in
         ~t_slow; static round-robin sharding would stack several slow-ish
         points on one rank. Asserts correctness + near-ideal wall time.
  bobe — a full 2-iteration BOBE EI loop through the pool (the orchestrator
         split-brain: workers block in worker_loop inside BOBE.__init__).
  wipstd — the flagship deployment shape: a WIPStd iteration (WIP sweep +
         ensemble refresh + NS) under the real process group WITH >=2 virtual
         devices per process. Exercises the device-mesh math path while
         worker ranks sit in worker_loop: production_mesh() must restrict to
         the process-local devices (a global-device mesh would dispatch
         single-controller work onto devices whose owning processes are not
         participating — hang). Asserts completion, logZ vs analytic truth,
         and parity with an in-process serial-pool rerun.
"""
import os
import sys
import time

import numpy as np


def quad(x):
    return -float(np.sum((np.asarray(x) - 0.5) ** 2) * 20.0)


SLOW = 1.5


def lumpy(x):
    # one expensive point per batch (x[0] > 0.9 marks it), the rest instant —
    # the Cobaya regime: failures return immediately, successes take ~1 s
    if x[0] > 0.9:
        time.sleep(SLOW)
    return quad(x)


BOUNDS = np.array([[0.0, 1.0], [0.0, 1.0]]).T


def main():
    mode, rank, size, port = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                              sys.argv[4])
    if mode == "wipstd":
        # >=2 addressable devices per process, BEFORE the backend initializes
        os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                                   + os.environ.get("XLA_FLAGS", ""))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=size, process_id=rank)

    from bobe_tpu.likelihood import Likelihood
    from bobe_tpu.parallel.pool import DistributedPool

    lk = Likelihood(quad, ["a", "b"], param_bounds=BOUNDS)

    if mode == "pool":
        pool = DistributedPool()
        assert pool.size == size and pool.rank == rank
        if pool.is_main_process:
            rng = np.random.default_rng(0)
            pts1 = rng.uniform(size=(7, 2))   # not a multiple of size
            v1 = pool.run_map_objective(lk, pts1)
            exp1 = np.asarray([quad(p) for p in pts1])
            assert np.allclose(v1, exp1), (v1, exp1)
            pts2 = rng.uniform(size=(5, 2))   # protocol must be reusable
            v2 = pool.run_map_objective(lk, pts2)
            exp2 = np.asarray([quad(p) for p in pts2])
            assert np.allclose(v2, exp2), (v2, exp2)
            pool.close()
            print("POOL_PROTOCOL_OK", flush=True)
        else:
            pool.worker_loop(lk)
            print(f"WORKER_CLEAN_EXIT_{rank}", flush=True)
        return

    if mode == "hetero":
        lk_slow = Likelihood(lumpy, ["a", "b"], param_bounds=BOUNDS)
        pool = DistributedPool()
        assert pool._dyn, "dynamic task queue failed to come up"
        if pool.is_main_process:
            # 2*size - 1 instant points + ONE slow point, slow point first in
            # submission order: dynamic pulls keep every rank busy
            rng = np.random.default_rng(1)
            pts = rng.uniform(0.0, 0.8, size=(2 * size - 1, 2))
            pts = np.vstack([[[0.95, 0.5]], pts])
            t0 = time.time()
            vals = pool.run_map_objective(lk_slow, pts)
            wall = time.time() - t0
            exp = np.asarray([quad(p) for p in pts])
            assert np.allclose(vals, exp), (vals, exp)
            # ideal = SLOW (slow point hides the instant ones); static
            # round-robin would be fine here too, so ALSO check the pathologic
            # case: all slow points land on ranks' shards unevenly
            assert wall < SLOW + 1.0, f"hetero round took {wall:.2f}s"
            # second batch: `size` slow points — dynamic spreads them one per
            # rank (wall ~ SLOW); static round-robin on rank-strided shards
            # would serialize them when they collide on one rank
            pts2 = np.vstack([np.full((size, 2), 0.95),
                              rng.uniform(0.0, 0.8, size=(size, 2))])
            t0 = time.time()
            vals2 = pool.run_map_objective(lk_slow, pts2)
            wall2 = time.time() - t0
            assert np.allclose(vals2, np.asarray([quad(p) for p in pts2]))
            assert wall2 < 2 * SLOW, f"slow points serialized: {wall2:.2f}s"
            pool.close()
            print(f"HETERO_OK wall={wall:.2f} wall2={wall2:.2f}", flush=True)
        else:
            pool.worker_loop(lk_slow)
            print(f"WORKER_CLEAN_EXIT_{rank}", flush=True)
        return

    if mode == "bobe":
        import tempfile

        from bobe_tpu.bo import BOBE
        from bobe_tpu.parallel.pool import DistributedPool

        with tempfile.TemporaryDirectory() as tmp:
            bobe = BOBE(loglikelihood=quad, param_list=["a", "b"],
                        param_bounds=BOUNDS, n_cobaya_init=0, n_sobol_init=8,
                        save_dir=tmp, save=False, seed=7, acq="ei",
                        verbosity="WARNING", pool=DistributedPool())
            if rank == 0:
                res = bobe.run(acq="ei", min_evals=1, max_evals=12,
                               batch_size=size, ei_goal=1e-12)
                assert res is not None
                assert res["best_val"] > -5.0, res["best_val"]
                print(f"BOBE_DIST_OK best={res['best_val']:.4f}", flush=True)
            else:
                # workers already served + exited inside BOBE.__init__
                print(f"WORKER_CLEAN_EXIT_{rank}", flush=True)
        return

    if mode == "wipstd":
        import tempfile

        from bobe_tpu.bo import BOBE
        from bobe_tpu.models import toys
        from bobe_tpu.parallel.mesh import production_mesh
        from bobe_tpu.parallel.pool import DistributedPool

        assert jax.local_device_count() == 2, jax.local_devices()
        assert jax.device_count() == 2 * size, jax.devices()
        loglike, bounds, logz_true = toys.make_gaussian(2, sigma=0.15)
        run_kwargs = dict(acq="wipstd", min_evals=16, max_evals=40,
                          batch_size=2 * size, max_gp_size=64,
                          logz_threshold=0.08, convergence_n_iters=2,
                          fit_n_points=8, ns_n_points=4, mc_points_size=64)
        with tempfile.TemporaryDirectory() as tmp:
            bobe = BOBE(loglikelihood=loglike, param_list=["a", "b"],
                        param_bounds=bounds, n_cobaya_init=0, n_sobol_init=16,
                        save_dir=tmp, save=False, seed=3, verbosity="WARNING",
                        pool=DistributedPool())
            if rank == 0:
                mesh = production_mesh()
                assert mesh is not None and mesh.size == 2, (
                    "production mesh must cover exactly the process-LOCAL "
                    f"devices under a multi-process group, got {mesh}")
                res = bobe.run(**run_kwargs)
                logz = res["logz"]["mean"]
                assert np.isfinite(logz), res["logz"]
                assert abs(logz - logz_true) < 0.5, (logz, logz_true)
                # parity leg: identical seed + batch size through a serial
                # pool must reproduce the distributed run (the pool only
                # farms out deterministic likelihood evaluations)
                serial = BOBE(loglikelihood=loglike, param_list=["a", "b"],
                              param_bounds=bounds, n_cobaya_init=0,
                              n_sobol_init=16, save_dir=tmp, save=False,
                              seed=3, verbosity="WARNING", pool="serial")
                res_s = serial.run(**run_kwargs)
                dz = abs(logz - res_s["logz"]["mean"])
                assert dz < 1e-3, (logz, res_s["logz"]["mean"])
                print(f"WIPSTD_DIST_OK logz={logz:.4f} true={logz_true:.4f} "
                      f"serial_delta={dz:.2e}", flush=True)
            else:
                # workers served + exited inside BOBE.__init__
                print(f"WORKER_CLEAN_EXIT_{rank}", flush=True)
        return

    if mode == "serverfail":
        # Regression: a rank-0 task-queue server failure (restricted sockets)
        # must downgrade EVERY rank to static sharding — rank 0 still has to
        # broadcast the (all-zero) wire so the collectives stay aligned; the
        # original code skipped the broadcast and deadlocked the group.
        if rank == 0:
            from multiprocessing.managers import BaseManager

            def _boom(self):
                raise RuntimeError("test-injected server failure")

            BaseManager.get_server = _boom
        pool = DistributedPool()
        assert not pool._dyn, "expected static fallback after server failure"
        if pool.is_main_process:
            pts = np.random.default_rng(2).uniform(size=(5, 2))
            vals = pool.run_map_objective(lk, pts)
            assert np.allclose(vals, [quad(p) for p in pts])
            pool.close()
            print("SERVERFAIL_FALLBACK_OK", flush=True)
        else:
            pool.worker_loop(lk)
            print(f"WORKER_CLEAN_EXIT_{rank}", flush=True)
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
