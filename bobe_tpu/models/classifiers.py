"""Feasibility classifiers for the classifier-gated GP.

Reference behaviour (/root/reference/BOBE/clf.py): three pluggable classifiers
behind a registry — an SVM whose decision function is replayed in JAX, a small
MLP, and a learned Mahalanobis ellipsoid. Differences in this design:

* Every classifier's parameters are a **static-shape pytree** so they can ride
  through jitted samplers as traced context (the NS/NUTS loops never retrace
  when the classifier is retrained). The SVM's support vectors are padded to a
  capacity bucket with zero dual coefficients (a zero-coef SV contributes
  nothing to the decision function).
* The MLP is plain JAX/optax (tuple of (W, b) layers) rather than a framework
  module, so its apply function is generic in the parameter pytree.
* Prediction functions are *batched* ((m, d) -> (m,)) — gating whole GP
  prediction batches in one fused kernel.

Training runs on host-driven jitted steps (SVM via sklearn's SMO, as the
reference does, clf.py:42-43 — training time is negligible next to true
likelihood evaluations).
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.log import get_logger
from ..utils.seed import get_numpy_rng

log = get_logger("clf")

SV_PAD = 128  # support-vector capacity granularity


# =====================================================================
# batched apply functions (stable, jit-safe)
# =====================================================================

def _svm_apply(params, x):
    """RBF-SVM decision replay: (m, d) -> hard {0,1} probabilities
    (reference clf.py:188-213). Padded SVs have dual_coef 0."""
    sv, coef = params["support_vectors"], params["dual_coef"]
    d2 = (jnp.sum(x * x, -1)[:, None] + jnp.sum(sv * sv, -1)[None, :]
          - 2.0 * x @ sv.T)
    k = jnp.exp(-params["gamma"] * jnp.maximum(d2, 0.0))
    decision = k @ coef + params["intercept"]
    return jnp.where(decision >= 0.0, 1.0, 0.0)


def _mlp_forward(layers, x):
    h = x
    for w, b in layers[:-1]:
        h = jax.nn.relu(h @ w + b)
    w, b = layers[-1]
    return (h @ w + b)[..., 0]


def _nn_apply(params, x):
    return jax.nn.sigmoid(_mlp_forward(params["layers"], x))


def _ellipsoid_logit(params, x):
    d = x.shape[-1]
    L = jnp.zeros((d, d)).at[jnp.tril_indices(d)].set(params["flat_L"])
    diag = jnp.arange(d)
    L = L.at[diag, diag].set(jax.nn.softplus(L[diag, diag]) + 1e-4)
    diff = x - params["mu"]
    md2 = jnp.einsum("...i,ij,...j->...", diff, L @ L.T, diff)
    return -params["alpha"] * md2 + params["beta"]


def _ellipsoid_apply(params, x):
    return jax.nn.sigmoid(_ellipsoid_logit(params, x))


_APPLY = {"svm": _svm_apply, "nn": _nn_apply, "ellipsoid": _ellipsoid_apply}


def predict_proba_apply(kind: str) -> Callable:
    """Stable batched probability function for a classifier kind."""
    return _APPLY[kind]


# =====================================================================
# SVM (sklearn fit on host, padded JAX replay)
# =====================================================================

def train_svm_classifier(X, Y, settings=None, init_params=None, **kwargs):
    from sklearn.svm import SVC

    settings = dict(settings or {})
    C = settings.get("C", 1e7)
    clf = SVC(kernel=settings.get("kernel", "rbf"),
              gamma=settings.get("gamma", "scale"), C=C)
    X = np.asarray(X)
    clf.fit(X, np.asarray(Y))
    sv = np.asarray(clf.support_vectors_, dtype=np.float64)
    coef = np.asarray(clf.dual_coef_[0], dtype=np.float64)
    n_sv = sv.shape[0]
    cap = max(SV_PAD, ((n_sv + SV_PAD - 1) // SV_PAD) * SV_PAD)
    sv_pad = np.zeros((cap, X.shape[1]))
    sv_pad[:n_sv] = sv
    coef_pad = np.zeros(cap)
    coef_pad[:n_sv] = coef
    params = {
        "support_vectors": jnp.asarray(sv_pad),
        "dual_coef": jnp.asarray(coef_pad),
        "intercept": jnp.asarray(float(clf.intercept_[0])),
        "gamma": jnp.asarray(float(clf._gamma)),
    }
    metrics = {"n_support_vectors": int(n_sv), "C": f"{C:.2e}",
               "gamma": f"{float(clf._gamma):.2e}"}
    predict_fn = jax.jit(partial(_svm_apply, params))
    return params, metrics, predict_fn


def get_svm_predict_proba_fn(params, *a, **k):
    return jax.jit(partial(_svm_apply, params))


# =====================================================================
# shared optax trainer
# =====================================================================

def _train_bce(apply_logit, params, X, Y, lr, weight_decay, n_epochs,
               batch_size, seed):
    X = jnp.asarray(X)
    Y = jnp.asarray(Y, dtype=X.dtype)
    n = X.shape[0]
    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def loss_fn(p, bx, by):
        return optax.sigmoid_binary_cross_entropy(apply_logit(p, bx), by).mean()

    @jax.jit
    def epoch_step(carry, perm):
        p, s = carry

        def one(carry, idx):
            p, s = carry
            bx, by = X[idx], Y[idx]
            g = jax.grad(loss_fn)(p, bx, by)
            up, s = opt.update(g, s, p)
            return (optax.apply_updates(p, up), s), None

        steps = max(1, n // batch_size)
        idxs = perm[: steps * batch_size].reshape(steps, batch_size)
        (p, s), _ = jax.lax.scan(one, (p, s), idxs)
        return (p, s), None

    rng = np.random.default_rng(seed)
    perms = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(n_epochs)]))
    (params, _), _ = jax.lax.scan(epoch_step, (params, opt_state), perms)
    final_loss = float(loss_fn(params, X, Y))
    # "loss" carries the full-precision value for restart selection;
    # "train_loss" stays the display string (reference-compatible metrics)
    return params, {"train_loss": f"{final_loss:.2e}", "loss": final_loss,
                    "epochs": n_epochs}


def _train_with_restarts(init_fn, apply_logit, X, Y, settings, init_params,
                         n_restarts=2):
    rng = get_numpy_rng()
    best_loss, best_params, best_metrics = np.inf, None, {}
    for i in range(n_restarts):
        seed = int(rng.integers(0, 2**31 - 1))
        p0 = init_params if (i == 0 and init_params is not None) else init_fn(seed)
        params, metrics = _train_bce(
            apply_logit, p0, X, Y,
            lr=settings.get("lr", 1e-3),
            weight_decay=settings.get("weight_decay", 1e-4),
            n_epochs=settings.get("n_epochs", 300),
            batch_size=min(settings.get("batch_size", 64), len(X)),
            seed=seed)
        loss = float(metrics["loss"])
        # NaN < x is always False, so a diverged restart can never win; the
        # explicit isfinite guard documents that and keeps inf losses out too
        if np.isfinite(loss) and loss < best_loss:
            best_loss, best_params, best_metrics = loss, params, metrics
    if best_params is None:
        # every restart diverged: keep the caller's previous parameters (a
        # working classifier must never be overwritten with None — gating
        # would silently vanish mid-run)
        log.warning("classifier training diverged in all restarts; keeping "
                    "previous parameters")
        return init_params, {"train_loss": "nan", "loss": float("nan")}
    return best_params, best_metrics


# =====================================================================
# NN classifier
# =====================================================================

def train_nn_classifier(X, Y, settings=None, init_params=None, **kwargs):
    settings = dict(settings or {})
    hidden = tuple(settings.get("hidden_dims", (32, 32)))
    d = np.asarray(X).shape[1]
    dims = (d,) + hidden + (1,)

    def init_fn(seed):
        key = jax.random.PRNGKey(seed)
        layers = []
        for i in range(len(dims) - 1):
            key, k = jax.random.split(key)
            w = jax.random.normal(k, (dims[i], dims[i + 1])) * np.sqrt(2.0 / dims[i])
            layers.append((w, jnp.zeros(dims[i + 1])))
        return {"layers": tuple(layers)}

    settings.setdefault("lr", 1e-3)
    params, metrics = _train_with_restarts(
        init_fn, lambda p, x: _mlp_forward(p["layers"], x), X, Y, settings,
        init_params, n_restarts=settings.get("n_restarts", 2))
    return params, metrics, jax.jit(partial(_nn_apply, params))


def get_nn_predict_proba_fn(params, settings=None, **kwargs):
    return jax.jit(partial(_nn_apply, params))


# =====================================================================
# Ellipsoid classifier
# =====================================================================

def train_ellipsoid_classifier(X, Y, settings=None, init_params=None, **kwargs):
    settings = dict(settings or {})
    X = np.asarray(X)
    d = X.shape[1]
    mu = jnp.asarray(kwargs.get("best_pt", 0.5 * np.ones(d)))

    def init_fn(seed):
        key = jax.random.PRNGKey(seed)
        tril = d * (d + 1) // 2
        return {
            "flat_L": jax.random.normal(key, (tril,)) * settings.get("init_scale", 0.1),
            "alpha": jnp.asarray(1.0),
            "beta": jnp.asarray(0.0),
            "mu": mu,
        }

    settings.setdefault("lr", 1e-2)
    params, metrics = _train_with_restarts(
        init_fn, _ellipsoid_logit, X, Y, settings, init_params,
        n_restarts=settings.get("n_restarts", 2))
    return params, metrics, jax.jit(partial(_ellipsoid_apply, params))


def get_ellipsoid_predict_proba_fn(params, settings=None, d=None, **kwargs):
    return jax.jit(partial(_ellipsoid_apply, params))


CLASSIFIER_REGISTRY: Dict[str, Dict[str, Callable]] = {
    "svm": {"train_fn": train_svm_classifier,
            "predict_fn": get_svm_predict_proba_fn},
    "nn": {"train_fn": train_nn_classifier,
           "predict_fn": get_nn_predict_proba_fn},
    "ellipsoid": {"train_fn": train_ellipsoid_classifier,
                  "predict_fn": get_ellipsoid_predict_proba_fn},
}
