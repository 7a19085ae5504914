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


def test_close_is_idempotent():
    """run() closes in a finally block on top of its normal-path closes; a
    second EXIT broadcast would have no worker_loop partner and hang."""
    pool = make_pool_stub(rank=0, size=2, transcripts=np.zeros(1))
    pool.close()
    pool.close()
    exits = [s for s in pool._sent if int(s[0]) == DistributedPool.TASK_EXIT]
    assert len(exits) == 1


def test_worker_rank_direct_call_raises():
    """Direct run_map_objective from a worker rank would post a collective
    sequence mismatched with rank 0's and hang the group — it must raise."""
    lk = Likelihood(lambda x: 0.0, ["a"], param_bounds=np.array([[0.0], [1.0]]))
    pool = make_pool_stub(rank=1, size=2, transcripts=np.zeros(2))
    with pytest.raises(RuntimeError, match="rank-0 only"):
        pool.run_map_objective(lk, np.zeros((2, 1)))


def test_eval_shard_exception_becomes_nan_not_raise():
    """_eval_shard must always post its all-gather: a raise would leave every
    other rank blocked at the collective. Exceptions become NaN locally."""
    class RawBoom:
        minus_inf = -1e10

        def __call__(self, p):
            raise ValueError("pool-level bug")

    pool = DistributedPool.__new__(DistributedPool)
    pool.rank, pool.size = 0, 2
    vals = pool._eval_shard(RawBoom(), np.zeros((4, 1)))
    assert np.isnan(vals[0]) and np.isnan(vals[2])  # rank-0 shard failed
    assert np.isnan(vals[1]) and np.isnan(vals[3])  # other rank's (unset)


def test_remote_worker_failure_fails_fast_on_rank0():
    """A NaN surviving the ordered combine (a worker-side failure) must raise
    on rank 0 instead of silently feeding NaN into the GP targets."""
    lk = Likelihood(lambda x: -float(np.sum(x**2)), ["a", "b"],
                    param_bounds=np.array([[0, 1], [0, 1.0]]).T)
    pts = np.random.default_rng(0).uniform(size=(4, 2))
    truth = np.array([lk(p) for p in pts])
    truth[2] = np.nan  # emulate rank 2's point failing remotely
    pool = make_pool_stub(rank=0, size=3, transcripts=truth)
    with pytest.raises(RuntimeError, match="failed on a worker rank"):
        pool.run_map_objective(lk, pts)


def test_cobaya_shard_exception_becomes_nan_not_raise():
    """_cobaya_shard must always post its allgathers — a raise inside the
    per-point draw loop would desynchronize the collective protocol and
    hang every other rank (same discipline as _eval_shard)."""
    class BoomLike:
        ndim = 2

        def _get_single_valid_point(self, rng):
            raise RuntimeError("theory code exploded")

    pool = DistributedPool.__new__(DistributedPool)
    pool.rank, pool.size = 0, 2
    posted = []
    pool._allgather_rows = lambda local: (posted.append(np.asarray(local)),
                                          np.stack([np.asarray(local)] * 2))[1]
    out = pool._cobaya_shard(BoomLike(), 4)
    assert len(posted) == 2          # both collectives were still posted
    assert all(np.isnan(lp) for _, lp in out)


def test_get_cobaya_initial_points_fails_fast_on_all_nan(monkeypatch):
    """Rank 0's public API raises on an all-failed point (a consistent,
    post-collective failure) instead of returning NaN points."""
    class BoomLike:
        ndim = 2

        def _get_single_valid_point(self, rng):
            raise RuntimeError("theory code exploded")

    pool = DistributedPool.__new__(DistributedPool)
    pool.rank, pool.size = 0, 2
    pool._bcast = lambda arr: np.asarray(arr)
    pool._allgather_rows = lambda local: np.stack([np.asarray(local)] * 2)
    with pytest.raises(RuntimeError, match="initial-point generation failed"):
        pool.get_cobaya_initial_points(BoomLike(), 3)
