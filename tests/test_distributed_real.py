"""Real multi-process validation of the distributed runtime.

Spawns 2-3 OS processes that form a genuine ``jax.distributed`` group over
localhost (gloo CPU collectives) and drive ``DistributedPool`` through
``tests/distributed_driver.py``. This proves the bcast/allgather protocol,
shard-reassembly ordering, worker_loop exit, and the BOBE orchestrator
split-brain under conditions where they can actually deadlock — the
multi-process analogue of the reference's ``mpirun -n 4 python test_mpi.py``
(/root/reference/tests/test_mpi.py:343-347), but run in CI.
"""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
DRIVER = os.path.join(HERE, "distributed_driver.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_group(mode: str, size: int, timeout: int):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (os.path.dirname(HERE) + os.pathsep
                         + env.get("PYTHONPATH", ""))
    # the driver provisions its own single-process-per-rank cpu platform
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, DRIVER, mode, str(r), str(size), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for r in range(size)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


@pytest.mark.parametrize("size", [2, 3])
def test_distributed_pool_protocol_real_group(size):
    outs = _launch_group("pool", size, timeout=420)
    rc0, out0, err0 = outs[0]
    assert rc0 == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert "POOL_PROTOCOL_OK" in out0
    for r in range(1, size):
        rc, out, err = outs[r]
        assert rc == 0, f"rank{r} failed:\n{err[-3000:]}"
        assert f"WORKER_CLEAN_EXIT_{r}" in out


def test_bobe_ei_loop_under_real_group():
    outs = _launch_group("bobe", 2, timeout=600)
    rc0, out0, err0 = outs[0]
    assert rc0 == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert "BOBE_DIST_OK" in out0
    rc1, out1, err1 = outs[1]
    assert rc1 == 0, f"rank1 failed:\n{err1[-3000:]}"
    assert "WORKER_CLEAN_EXIT_1" in out1


def test_wipstd_device_mesh_under_real_group():
    """The flagship deployment shape: rank 0 drives a full WIPStd iteration
    (WIP sweep + ensemble refresh + NS) over its LOCAL 2-device mesh while
    rank 1 serves likelihoods in worker_loop. A production_mesh() built from
    the global device list would dispatch single-controller work onto rank
    1's devices and hang the group (the round-3 gap: the bobe driver mode ran
    EI only, which never consults the mesh). Also asserts logZ parity with an
    in-process serial-pool rerun."""
    outs = _launch_group("wipstd", 2, timeout=900)
    rc0, out0, err0 = outs[0]
    assert rc0 == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert "WIPSTD_DIST_OK" in out0
    rc1, out1, err1 = outs[1]
    assert rc1 == 0, f"rank1 failed:\n{err1[-3000:]}"
    assert "WORKER_CLEAN_EXIT_1" in out1


def test_server_failure_falls_back_to_static_sharding():
    """A rank-0 task-queue server failure must downgrade the whole group to
    static sharding (the advertised fallback), not deadlock the broadcast /
    all-gather rendezvous."""
    outs = _launch_group("serverfail", 2, timeout=420)
    rc0, out0, err0 = outs[0]
    assert rc0 == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert "SERVERFAIL_FALLBACK_OK" in out0
    rc1, out1, err1 = outs[1]
    assert rc1 == 0, f"rank1 failed:\n{err1[-3000:]}"
    assert "WORKER_CLEAN_EXIT_1" in out1


def test_dynamic_scheduling_heterogeneous_cost():
    """Greedy dynamic scheduling must load-balance heterogeneous evaluation
    times (the reference's send-one/recv-any farm, pool.py:143-206): a batch
    with one slow point completes in ~t_slow, and `size` slow points spread
    one per rank instead of stacking on a static shard."""
    outs = _launch_group("hetero", 3, timeout=420)
    rc0, out0, err0 = outs[0]
    assert rc0 == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert "HETERO_OK" in out0
    for r in range(1, 3):
        rc, out, err = outs[r]
        assert rc == 0, f"rank{r} failed:\n{err[-3000:]}"
        assert f"WORKER_CLEAN_EXIT_{r}" in out
