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
