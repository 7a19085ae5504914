"""Cold-start compile prewarming (utils/prewarm.py).

The prewarmer must (a) touch every first-iteration graph without raising,
(b) trigger next-bucket warms only when a capacity crossing is imminent, and
(c) never perturb run results — it draws from private RNGs and mutates only
throwaway GP copies. (A full prewarm-on/off e2e determinism A/B was measured
identical on the banana mini-run; here we keep the cheap invariants.)
"""
import types

import numpy as np
import pytest

from bobe_tpu.models.gp import GP
from bobe_tpu.utils import prewarm
from bobe_tpu.utils.seed import get_numpy_rng


def _mk_gp(n, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    y = -np.sum(((x - 0.5) / 0.3) ** 2, axis=1)
    return GP(train_x=x, train_y=y, noise=1e-8)


def _mk_bo(gp, **over):
    ns = types.SimpleNamespace(
        gp=gp, mc_points_method="EHMC", num_hmc_warmup=None,
        num_hmc_samples=128, hmc_thinning=None, hmc_num_chains=None,
        mc_points_size=16, batch_size=4, fit_n_points=10, max_gp_size=10_000,
        acquisition=types.SimpleNamespace(name="WIPStd"))
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_prewarm_run_compiles_all_tracks():
    bo = _mk_bo(_mk_gp(10))
    w = prewarm.prewarm_run(bo, ["wipstd"])
    assert w.wait(timeout=600)
    assert w.errors == {}, w.errors


def test_prewarm_ei_only_skips_wip_tracks():
    bo = _mk_bo(_mk_gp(10))
    w = prewarm.prewarm_run(bo, ["logei"])
    assert w.wait(timeout=600)
    assert w.errors == {}, w.errors
    # an EI-only schedule warms fit + the EI optimizer, no WIP/sampler/NS
    names = sorted(t.name for t in w._threads)
    assert names == ["prewarm-ei", "prewarm-fit"]


def test_next_bucket_triggers_only_near_cap():
    bo = _mk_bo(_mk_gp(10))  # cap 128, n 10 -> far from crossing
    assert prewarm.prewarm_next_bucket(bo) is None

    bo = _mk_bo(_mk_gp(124))  # within 2*batch of cap 128
    w = prewarm.prewarm_next_bucket(bo)
    assert w is not None
    assert w.wait(timeout=600)
    assert w.errors == {}, w.errors


def test_next_bucket_suppressed_at_max_gp_size():
    bo = _mk_bo(_mk_gp(124), max_gp_size=100)  # growth cannot happen
    assert prewarm.prewarm_next_bucket(bo) is None


def test_prewarm_leaves_live_gp_and_global_rng_untouched():
    gp = _mk_gp(10)
    state_before = gp.state
    rng_state_before = get_numpy_rng().bit_generator.state
    bo = _mk_bo(gp)
    w = prewarm.prewarm_run(bo, ["wipstd"])
    assert w.wait(timeout=600)
    # live state object unchanged (prewarm mutates only throwaway copies)
    assert gp.state is state_before
    assert get_numpy_rng().bit_generator.state == rng_state_before


def test_enabled_default_off_on_cpu(monkeypatch):
    monkeypatch.delenv("BOBE_TPU_PREWARM", raising=False)
    assert prewarm.prewarm_enabled() is False  # tests run on the CPU backend
    monkeypatch.setenv("BOBE_TPU_PREWARM", "1")
    assert prewarm.prewarm_enabled() is True
    monkeypatch.setenv("BOBE_TPU_PREWARM", "0")
    assert prewarm.prewarm_enabled() is False


def test_bucket_crossing_copy_is_production_faithful():
    """The next-bucket dummy must be a REAL copy in the next capacity bucket:
    same class / cfg / warp flag, capacity grown, live GP untouched. A plain
    synthetic stand-in would warm graphs whose static keys (cfg incl. clf
    gating and input warp) don't match production's."""
    from bobe_tpu.models.clf_gp import GPwithClassifier

    rng = np.random.default_rng(5)
    x = rng.uniform(size=(124, 3))
    y = -np.sum(((x - 0.5) / 0.2) ** 2, axis=1) * 30
    gp = GPwithClassifier(train_x=x, train_y=y, clf_type="svm",
                          clf_use_size=10, noise=1e-8)
    cap_before = gp.state.x.shape[0]
    n_before = gp.gp_size
    batch = 4
    dummy = prewarm._bucket_crossing_copy(gp, batch)
    assert type(dummy) is type(gp)
    assert dummy.cfg == gp.cfg  # static jit keys match production
    assert dummy.state.x.shape[0] > cap_before  # next bucket reached
    # EVERY synthetic point entered the GP subset (no silent clf filtering),
    # in production-shaped batch-wide chunks
    need = cap_before - n_before + 1
    n_chunks = -(-need // batch)
    assert dummy.gp_size == n_before + n_chunks * batch
    # and never raised the incumbent RAW max (no subset-rebuild path)
    assert float(np.max(np.asarray(dummy.train_y_raw))) == pytest.approx(
        float(np.max(np.asarray(gp.train_y_raw))))
    # live GP untouched
    assert gp.state.x.shape[0] == cap_before and gp.gp_size == n_before


def test_bucket_crossing_copy_preserves_input_warp():
    rng = np.random.default_rng(7)
    x = rng.uniform(size=(126, 2))
    y = -np.sum(((x - 0.5) / 0.3) ** 2, axis=1)
    gp = GP(train_x=x, train_y=y, noise=1e-8, input_warp=True)
    dummy = prewarm._bucket_crossing_copy(gp, 4)
    assert dummy.cfg.input_warp and dummy.cfg == gp.cfg
    assert dummy.state.x.shape[0] > gp.state.x.shape[0]


def test_bucket_crossing_copy_tight_clf_threshold():
    """gp_threshold <= 2 used to silently filter the synthetic points (they
    sat 1-2 nats below the max, outside the subset window), so the dummy
    never crossed the bucket and the crossing warmed the WRONG graphs."""
    from bobe_tpu.models.clf_gp import GPwithClassifier

    rng = np.random.default_rng(11)
    x = rng.uniform(size=(124, 3))
    # gentle bowl: every training point stays inside the 1.5-nat window, so
    # the bucket crossing is imminent and only the SYNTHETIC points (which
    # the old 1-2-nat offset placed outside it) are at filtering risk
    y = -np.sum((x - 0.5) ** 2, axis=1)
    gp = GPwithClassifier(train_x=x, train_y=y, clf_type="svm",
                          clf_use_size=10, noise=1e-8, gp_threshold=1.5)
    n_before, batch = gp.gp_size, 4
    dummy = prewarm._bucket_crossing_copy(gp, batch)
    assert dummy.state.x.shape[0] > gp.state.x.shape[0]
    need = gp.state.x.shape[0] - n_before + 1
    assert dummy.gp_size == n_before + -(-need // batch) * batch
    assert float(np.max(np.asarray(dummy.train_y_raw))) == pytest.approx(
        float(np.max(np.asarray(gp.train_y_raw))))


def test_prewarm_with_classifier_gp():
    """Cosmology-regime prewarm: the gated sampler/NS graphs and the clf-GP
    fit/update path must warm without errors."""
    from bobe_tpu.models.clf_gp import GPwithClassifier

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(40, 2))
    y = -np.sum(((x - 0.5) / 0.2) ** 2, axis=1) * 30  # wide range -> clf active
    gp = GPwithClassifier(train_x=x, train_y=y, clf_type="svm",
                          clf_use_size=10, noise=1e-8)
    bo = _mk_bo(gp)
    w = prewarm.prewarm_run(bo, ["wipstd"])
    assert w.wait(timeout=600)
    assert w.errors == {}, w.errors


def test_prewarm_boot_sync_single_bucket():
    """The device-server boot prewarm walks the bucket ladder synchronously
    and reports the capacities it warmed; a max_gp_size inside the first
    bucket warms exactly one."""
    buckets = prewarm.prewarm_boot_sync(
        2, max_gp_size=64,
        settings={"num_hmc_samples": 64, "mc_points_size": 16,
                  "batch_size": 4})
    assert buckets == [128]  # PAD_MULTIPLE floor
