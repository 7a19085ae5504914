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
  bobe — a full 2-iteration BOBE EI loop through the pool (the orchestrator
         split-brain: workers block in worker_loop inside BOBE.__init__).
"""
import sys

import numpy as np


def quad(x):
    return -float(np.sum((np.asarray(x) - 0.5) ** 2) * 20.0)


BOUNDS = np.array([[0.0, 1.0], [0.0, 1.0]]).T


def main():
    mode, rank, size, port = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                              sys.argv[4])
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

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
