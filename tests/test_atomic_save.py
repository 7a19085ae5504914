"""Crash-recovery checkpoints must be written atomically: a process killed
mid-write (timeout, preemption) must never corrupt the previous good
checkpoint it exists to restore (reference utils/results.py:782 writes
in place; we write tmp + os.replace)."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from bobe_tpu.models.gp import GP
from bobe_tpu.utils.results import BOBEResults


def _toy_gp():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(12, 2))
    y = -np.sum((x - 0.5) ** 2, axis=1)
    return GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)


def test_gp_save_survives_crash_mid_write(tmp_path, monkeypatch):
    gp = _toy_gp()
    path = str(tmp_path / "ckpt.npz")
    gp.save(path)
    good = open(path, "rb").read()

    def boom(f, **arrays):
        f.write(b"partial garbage")
        raise RuntimeError("killed mid-write")

    monkeypatch.setattr(np, "savez", boom)
    with pytest.raises(RuntimeError):
        gp.save(path)
    # the previous good checkpoint is untouched and still loads
    assert open(path, "rb").read() == good
    monkeypatch.undo()
    gp2 = GP.load(path)
    assert gp2.npoints == gp.npoints


def test_intermediate_save_survives_crash_mid_write(tmp_path, monkeypatch):
    rm = BOBEResults("atomic_test", save_dir=str(tmp_path),
                     param_names=["a", "b"])
    rm.save_intermediate()
    path = tmp_path / "atomic_test_intermediate.json"
    good = path.read_bytes()
    json.loads(good)  # valid JSON to begin with

    def boom(obj, f, **kwargs):
        f.write("{\"trunc")
        raise RuntimeError("killed mid-write")

    monkeypatch.setattr(json, "dump", boom)
    with pytest.raises(RuntimeError):
        rm.save_intermediate()
    assert path.read_bytes() == good
    json.loads(path.read_bytes())


def _results(tmp_path, name="at"):
    return BOBEResults(likelihood_name=name, param_names=["a", "b"],
                      param_labels=["a", "b"],
                      param_bounds=np.array([[0.0, 0.0], [1.0, 1.0]]),
                      output_file=name, save_dir=str(tmp_path))


def test_chain_files_survive_crash_mid_write(tmp_path, monkeypatch):
    """<base>_checkpoint.txt is the posterior snapshot resume reads back —
    a kill mid-np.savetxt must not truncate the previous good file."""
    rm = _results(tmp_path)
    sd = {"x": np.random.default_rng(0).uniform(size=(8, 2)),
          "logl": np.zeros(8), "weights": np.full(8, 1 / 8)}
    rm.save_chain_files(sd, filename="at_checkpoint")
    good = open(tmp_path / "at_checkpoint.txt").read()

    def boom(f, data):
        f.write("partial garbage")
        raise RuntimeError("killed mid-write")

    monkeypatch.setattr(np, "savetxt", boom)
    with pytest.raises(RuntimeError):
        rm.save_chain_files(sd, filename="at_checkpoint")
    assert open(tmp_path / "at_checkpoint.txt").read() == good


def test_resume_tolerates_corrupt_chain_and_restores_state(tmp_path):
    """A corrupt checkpoint chain must not discard the (independently
    restored) run state, and a single-row chain must still load (ndmin)."""
    rm = _results(tmp_path, "cr")
    rm.update_convergence(3, {"mean": -1.0, "upper": -0.9, "lower": -1.1},
                          False, 0.05)
    rm.save_intermediate()
    # corrupt chain: ragged last row
    with open(tmp_path / "cr_checkpoint.txt", "w") as f:
        f.write("1.0 0.5 0.1 0.2\n1.0 0.5 0.1\n")
    rm2 = _results(tmp_path, "cr")
    rm2._load_existing_results()
    assert rm2._resumed is True            # state restored
    assert len(rm2.convergence_history) == 1
    assert rm2.final_samples is None       # chain skipped, not fatal

    # single-row chain: loads via ndmin=2 instead of being silently skipped
    with open(tmp_path / "cr_checkpoint.txt", "w") as f:
        f.write("1.0 0.5 0.1 0.2\n")
    rm3 = _results(tmp_path, "cr")
    rm3._load_existing_results()
    assert rm3.final_samples is not None
    assert rm3.final_samples.shape == (1, 2)
