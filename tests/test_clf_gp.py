"""Classifier-GP tests (mirroring /root/reference/tests/test_clf_gp.py):
data with deliberate minus_inf outliers, gated predictions, update thresholds,
classifier training, filtered random points, state round-trip, copy."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from bobe_tpu.models.classifiers import CLASSIFIER_REGISTRY, predict_proba_apply
from bobe_tpu.models.clf_gp import GPwithClassifier

MINUS_INF = -1e5


def make_clf_data(n=40, d=2, seed=0):
    """Gaussian bump with a minus_inf failure region (x0 > 0.8)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    y = -50.0 * np.sum((x - 0.4) ** 2, axis=1)
    y = np.where(x[:, 0] > 0.8, MINUS_INF, y)
    return x, y


@pytest.fixture(scope="module")
def clf_gp():
    x, y = make_clf_data()
    return GPwithClassifier(train_x=x, train_y=y, clf_type="svm",
                            clf_use_size=10, minus_inf=MINUS_INF,
                            clf_threshold=100.0, gp_threshold=200.0)


def test_gp_subset_excludes_failures(clf_gp):
    assert clf_gp.clf_data_size == 40
    # GP trains only on points within gp_threshold of the max
    assert clf_gp.npoints == 40  # classifier-set size (reference clf_gp.py:466)
    gp_n = int(clf_gp.state.n)
    x, y = make_clf_data()
    assert gp_n == int(np.sum(y > y.max() - 200.0))
    assert gp_n < 40


def test_classifier_trained_and_gates(clf_gp):
    assert clf_gp.use_clf
    assert clf_gp.clf_params is not None
    # a point deep in the failure region is gated to minus_inf
    bad = jnp.asarray([[0.95, 0.5]])
    good = jnp.asarray([[0.4, 0.4]])
    assert float(clf_gp.predict_mean_batched(bad)[0]) == MINUS_INF
    assert float(clf_gp.predict_mean_batched(good)[0]) > MINUS_INF
    assert float(clf_gp.predict_var_batched(bad)[0]) <= 1e-10
    m, v = clf_gp.predict_batched(bad)
    assert float(m[0]) == MINUS_INF


def test_update_appends_and_refilters():
    x, y = make_clf_data(30, 2, seed=1)
    gp = GPwithClassifier(train_x=x, train_y=y, clf_type="svm",
                          clf_use_size=10, minus_inf=MINUS_INF,
                          clf_threshold=100.0, gp_threshold=200.0)
    n_clf0, n_gp0 = gp.clf_data_size, int(gp.state.n)
    gp.update(np.array([[0.41, 0.39]]), np.array([-0.5]))
    assert gp.clf_data_size == n_clf0 + 1
    assert int(gp.state.n) == n_gp0 + 1
    # a huge new max can evict old points from the GP subset
    gp.update(np.array([[0.42, 0.40]]), np.array([500.0]))
    assert gp.clf_data_size == n_clf0 + 2
    assert int(gp.state.n) <= n_gp0 + 2


def test_random_point_filtered(clf_gp):
    rng = np.random.default_rng(7)
    for _ in range(5):
        pt = np.asarray(clf_gp.get_random_point(rng=rng))
        assert pt.shape == (2,)
        # filtered points come from the dataset's feasible region
        assert pt[0] <= 0.8


def test_state_roundtrip(tmp_path, clf_gp):
    fn = os.path.join(tmp_path, "clf_gp_test")
    clf_gp.save(fn)
    gp2 = GPwithClassifier.load(fn)
    assert gp2.clf_data_size == clf_gp.clf_data_size
    assert gp2.use_clf == clf_gp.use_clf
    xq = jnp.asarray(np.random.default_rng(3).uniform(size=(6, 2)))
    np.testing.assert_allclose(np.asarray(clf_gp.predict_mean_batched(xq)),
                               np.asarray(gp2.predict_mean_batched(xq)),
                               rtol=1e-5, atol=1e-5)


def test_copy_independent(clf_gp):
    gp2 = clf_gp.copy()
    n0 = clf_gp.clf_data_size
    gp2.update(np.array([[0.33, 0.77]]), np.array([-3.0]))
    assert gp2.clf_data_size == n0 + 1
    assert clf_gp.clf_data_size == n0


@pytest.mark.parametrize("kind", ["nn", "ellipsoid"])
def test_other_classifier_types(kind):
    x, y = make_clf_data(40, 2, seed=2)
    labels = (y > y.max() - 100.0).astype(np.float64)
    train_fn = CLASSIFIER_REGISTRY[kind]["train_fn"]
    params, metrics, predict_fn = train_fn(
        x, labels, {"n_epochs": 150}, best_pt=x[np.argmax(y)])
    probs = np.asarray(predict_fn(jnp.asarray(x)))
    assert probs.shape == (40,)
    assert np.all((probs >= 0) & (probs <= 1))
    acc = np.mean((probs > 0.5) == labels)
    assert acc > 0.8, f"{kind} classifier accuracy {acc}"
    # stable apply function matches the returned predict_fn
    apply = predict_proba_apply(kind)
    np.testing.assert_allclose(np.asarray(apply(params, jnp.asarray(x))), probs,
                               rtol=1e-6)


def test_svm_apply_padding_invariant():
    x, y = make_clf_data(40, 2, seed=4)
    labels = (y > y.max() - 100.0).astype(np.float64)
    params, _, predict_fn = CLASSIFIER_REGISTRY["svm"]["train_fn"](x, labels)
    # padded SVs with zero dual coef must not change decisions
    assert params["support_vectors"].shape[0] % 128 == 0
    probs = np.asarray(predict_fn(jnp.asarray(x)))
    acc = np.mean((probs > 0.5) == labels)
    assert acc > 0.9


def test_update_dedupes_within_batch():
    """Two identical points in ONE batch must enter train_x_clf once:
    intra-batch duplicates re-entered the GP at every subset rebuild and
    state round-trip, degrading the Cholesky toward singularity."""
    x, y = make_clf_data(n=30)
    gp = GPwithClassifier(train_x=x, train_y=y, clf_use_size=10)
    n0 = gp.clf_data_size
    p = np.array([[0.33, 0.44]])
    batch = np.vstack([p, p])  # exact intra-batch duplicate
    gp.update(batch, np.array([-1.0, -1.0]))
    assert gp.clf_data_size == n0 + 1


def test_from_state_dict_preserves_names_and_bounds(tmp_path):
    """param_names / tausq_bounds / optimizer_options must survive the
    classifier-GP state round-trip (the subclass override dropped them while
    the base GP restored all three)."""
    x, y = make_clf_data(n=40)
    gp = GPwithClassifier(train_x=x, train_y=y, clf_use_size=10,
                          param_names=["alpha", "beta"],
                          tausq_bounds=(1e-3, 1e2),
                          optimizer_options={"maxiter_override": 123})
    state = gp.state_dict()
    gp2 = GPwithClassifier.from_state_dict(state)
    assert gp2.param_names == ["alpha", "beta"]
    assert tuple(gp2.cfg.tausq_bounds) == (1e-3, 1e2)
    assert gp2.optimizer_options == {"maxiter_override": 123}


def test_diverged_classifier_training_keeps_previous(monkeypatch):
    """If every training restart diverges (NaN loss), the previous working
    classifier must be kept — clf gating must not silently vanish mid-run."""
    from bobe_tpu.models import classifiers as clf_mod

    x, y = make_clf_data(n=40)
    gp = GPwithClassifier(train_x=x, train_y=y, clf_use_size=10,
                          clf_type="ellipsoid")
    assert gp.use_clf and gp.clf_params is not None
    old_params = gp.clf_params

    def nan_bce(apply_logit, p0, X, Y, **kw):
        return p0, {"train_loss": "nan", "loss": float("nan"), "epochs": 0}

    monkeypatch.setattr(clf_mod, "_train_bce", nan_bce)
    gp.update(np.array([[0.21, 0.37]]), np.array([-2.0]))
    gp.train_classifier()
    assert gp.clf_params is not None
    assert gp._clf_predict is not None
    # the kept parameters still gate (same pytree structure as before)
    assert set(gp.clf_params.keys()) == set(old_params.keys())
