"""DistributedPool scheduling logic, unit-tested with a stubbed transport
(real multi-process groups are exercised by jax.distributed in deployment;
here we pin the round-robin sharding, ordered combine, and task protocol)."""
import numpy as np
import pytest

from bobe_tpu.likelihood import Likelihood
from bobe_tpu.parallel.pool import DistributedPool


def make_pool_stub(rank, size, transcripts):
    pool = DistributedPool.__new__(DistributedPool)
    pool.rank = rank
    pool.size = size
    pool._sent = []

    def _bcast(arr):
        pool._sent.append(np.asarray(arr))
        return np.asarray(arr)

    pool._bcast = _bcast

    def _allgather(local):
        # emulate every rank computing its shard of the same batch
        rows = []
        for r in range(size):
            vals = np.full_like(np.asarray(local), np.nan, dtype=np.float64)
            idxs = np.arange(r, len(vals), size)
            for i in idxs:
                vals[i] = transcripts[i]
            rows.append(vals)
        return np.stack(rows)

    pool._allgather_rows = _allgather
    return pool


def test_round_robin_shard_and_ordered_combine():
    lk = Likelihood(lambda x: -float(np.sum(x**2)), ["a", "b"],
                    param_bounds=np.array([[0, 1], [0, 1.0]]).T)
    pts = np.random.default_rng(0).uniform(size=(7, 2))
    truth = np.array([lk(p) for p in pts])
    pool = make_pool_stub(rank=0, size=3, transcripts=truth)
    out = pool.run_map_objective(lk, pts)
    np.testing.assert_allclose(out, truth)
    # header broadcast carries the task code and shape
    head = pool._sent[0]
    assert int(head[0]) == DistributedPool.TASK_EVAL
    assert int(head[1]) == 7 and int(head[2]) == 2


def test_eval_shard_covers_disjoint_indices():
    lk = Likelihood(lambda x: float(x[0]), ["a"],
                    param_bounds=np.array([[0.0], [1.0]]))
    pts = np.linspace(0, 1, 10).reshape(-1, 1)
    covered = np.zeros(10, dtype=int)
    for r in range(4):
        pool = DistributedPool.__new__(DistributedPool)
        pool.rank, pool.size = r, 4
        vals = pool._eval_shard(lk, pts)
        covered += ~np.isnan(vals)
    np.testing.assert_array_equal(covered, np.ones(10, dtype=int))


def test_close_broadcasts_exit():
    pool = make_pool_stub(rank=0, size=2, transcripts=np.zeros(1))
    pool.close()
    assert int(pool._sent[-1][0]) == DistributedPool.TASK_EXIT
