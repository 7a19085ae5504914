"""Classifier-gated GP surrogate.

Mirrors the reference GPwithClassifier (/root/reference/BOBE/clf_gp.py): the
full dataset (including minus_inf failures) trains a feasibility classifier;
the GP itself is trained only on points within ``gp_threshold`` of the
incumbent; predictions outside the classifier's feasible region collapse to
``minus_inf`` (mean) / the noise floor (variance).

TPU-first details:
* The classifier's parameters are a static-shape pytree (models/classifiers),
  exposed as ``_clf_ctx`` so the NS/NUTS samplers can gate the GP mean inside
  their jitted loops with zero retraces when the classifier is retrained.
* GP-subset membership can shrink when the incumbent improves; updates that
  only append reuse the incremental Cholesky extension, membership changes
  trigger a rebuild (the reference recomputes O(N^3) on every update either
  way, clf_gp.py:238-244).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..utils.log import get_logger
from ..utils.seed import get_numpy_rng
from ..utils.core import get_threshold_for_nsigma
from .classifiers import CLASSIFIER_REGISTRY, predict_proba_apply
from .gp import DEDUP_ATOL, DEDUP_RTOL, GP, SAFE_NOISE_FLOOR

log = get_logger("clf_gp")


class GPwithClassifier(GP):
    def __init__(self, train_x=None, train_y=None,
                 clf_type: str = "svm", clf_settings: Optional[Dict] = None,
                 clf_use_size: int = 10, clf_update_step: int = 1,
                 probability_threshold: float = 0.5, minus_inf: float = -1e5,
                 clf_threshold: float = 250.0, gp_threshold: float = 500.0,
                 train_clf_on_init: bool = True,
                 **gp_kwargs):
        if train_x is None or train_y is None:
            raise ValueError("GPwithClassifier requires train_x and train_y "
                             "(the classifier needs labeled data)")
        self.train_x_clf = np.atleast_2d(np.asarray(train_x, dtype=np.float64))
        self.train_y_clf = np.asarray(train_y, dtype=np.float64).reshape(-1)
        self.clf_type = clf_type.lower()
        if self.clf_type not in CLASSIFIER_REGISTRY:
            raise ValueError(f"Unsupported classifier type: {self.clf_type}")
        self.clf_settings = dict(clf_settings or {})
        self.clf_use_size = int(clf_use_size)
        self.clf_update_step = int(clf_update_step)
        self.probability_threshold = float(probability_threshold)
        self.minus_inf = float(minus_inf)
        self.clf_threshold = float(clf_threshold)
        self.gp_threshold = float(gp_threshold)
        self.clf_params = None
        self.clf_metrics: Dict[str, Any] = {}
        self._clf_predict = None

        gp_kwargs.setdefault("lengthscale_prior", "DSLP")
        x_gp, y_gp = self._filter_gp_subset()
        super().__init__(train_x=x_gp, train_y=y_gp, **gp_kwargs)

        self.use_clf = self.clf_data_size >= self.clf_use_size
        if self.use_clf and train_clf_on_init:
            self.train_classifier()

    # ------------------------------------------------------------- dataset

    def _filter_gp_subset(self):
        if self.train_y_clf.size == 0:
            return self.train_x_clf, self.train_y_clf
        mask = self.train_y_clf > (self.train_y_clf.max() - self.gp_threshold)
        return self.train_x_clf[mask], self.train_y_clf[mask]

    @property
    def clf_data_size(self) -> int:
        return self.train_x_clf.shape[0]

    @property
    def npoints(self) -> int:
        """Total dataset size (classifier set), matching clf_gp.py:466."""
        return self.clf_data_size

    @property
    def _clf_ctx(self):
        """Traced classifier params for jitted gating, or None."""
        if self.use_clf and self.clf_params is not None:
            return self.clf_params
        return None

    # ----------------------------------------------------------- classifier

    def train_classifier(self):
        if not self.use_clf and self.clf_data_size >= self.clf_use_size:
            log.info(f"Classifier data size ({self.clf_data_size}) reached "
                     f"use size ({self.clf_use_size}); enabling classifier.")
            self.use_clf = True
        if self.use_clf:
            self._train_classifier()

    def _train_classifier(self):
        labels = np.where(
            self.train_y_clf < self.train_y_clf.max() - self.clf_threshold, 0, 1)
        if np.all(labels == labels[0]):
            log.debug("All classifier labels identical; disabling for now")
            self.use_clf = False
            return
        best_pt = self.train_x_clf[int(np.argmax(self.train_y_clf))]
        train_fn = CLASSIFIER_REGISTRY[self.clf_type]["train_fn"]
        params, metrics, predict = train_fn(
            self.train_x_clf, labels, self.clf_settings,
            init_params=self.clf_params, best_pt=best_pt)
        if params is None:
            # training produced nothing usable (e.g. every restart diverged
            # with no warm start): keep the previous classifier rather than
            # silently disabling the gate mid-run
            log.warning("classifier training failed; keeping previous "
                        f"classifier ({'none' if self.clf_params is None else 'active'})")
            return
        self.clf_params, self.clf_metrics, self._clf_predict = (
            params, metrics, predict)
        log.debug(f"Trained {self.clf_type} classifier on {self.clf_data_size} "
                  f"points: {self.clf_metrics}")

    def _gate(self, x):
        """Classifier probabilities for a batch, or None if inactive.
        Chunked like the GP predicts — callers pass NS-integral-sized
        batches (the padded-SV kernel is (n_sv, m))."""
        if not self.use_clf or self.clf_params is None:
            return None
        proba = predict_proba_apply(self.clf_type)
        return self._map_chunked(lambda xe: proba(self.clf_params, xe),
                                 jnp.atleast_2d(x))

    # ------------------------------------------------------------ prediction

    def predict_mean_batched(self, x):
        x = jnp.atleast_2d(x)
        mean = super().predict_mean_batched(x)
        p = self._gate(x)
        if p is None:
            return mean
        return jnp.where(p >= self.probability_threshold, mean, self.minus_inf)

    def predict_var_batched(self, x):
        x = jnp.atleast_2d(x)
        var = super().predict_var_batched(x)
        p = self._gate(x)
        if p is None:
            return var
        return jnp.where(p >= self.probability_threshold, var, SAFE_NOISE_FLOOR)

    def predict_batched(self, x):
        x = jnp.atleast_2d(x)
        mean, var = super().predict_batched(x)
        p = self._gate(x)
        if p is None:
            return mean, var
        ok = p >= self.probability_threshold
        return (jnp.where(ok, mean, self.minus_inf),
                jnp.where(ok, var, SAFE_NOISE_FLOOR))

    def predict_mean_with_params(self, log_params, x):
        # alternate-basin predictions (dlogz_hyp) must see the SAME
        # classifier gate as the production mean: hyperparameter uncertainty
        # should not leak probability mass into the infeasible region
        x = jnp.atleast_2d(x)
        mean = super().predict_mean_with_params(log_params, x)
        p = self._gate(x)
        if p is None:
            return mean
        return jnp.where(p >= self.probability_threshold, mean,
                         self.minus_inf)

    # --------------------------------------------------------------- updates

    def update(self, new_x, new_y):
        new_x = np.atleast_2d(np.asarray(new_x, dtype=np.float64))
        new_y = np.asarray(new_y, dtype=np.float64).reshape(-1)

        keep = []
        for i in range(new_x.shape[0]):
            # dedupe against the existing set AND the already-kept rows of
            # this batch (two acquisition proposals can converge to the same
            # point late-run; an intra-batch duplicate would re-enter the GP
            # at every subset rebuild / state round-trip). Tolerances shared
            # with the GP-level extend dedupe so the two sets stay in sync.
            prior = (np.vstack([self.train_x_clf, new_x[keep]])
                     if keep else self.train_x_clf)
            dup = np.any(np.all(np.isclose(prior, new_x[i],
                                           atol=DEDUP_ATOL, rtol=DEDUP_RTOL),
                                axis=1))
            if dup:
                log.debug(f"Point {new_x[i]} already in dataset; skipping")
            else:
                keep.append(i)
        if not keep:
            return
        new_x, new_y = new_x[keep], new_y[keep]

        old_max = self.train_y_clf.max() if self.train_y_clf.size else -np.inf
        self.train_x_clf = np.vstack([self.train_x_clf, new_x])
        self.train_y_clf = np.concatenate([self.train_y_clf, new_y])

        new_max = self.train_y_clf.max()
        cutoff_old = old_max - self.gp_threshold
        cutoff_new = new_max - self.gp_threshold
        membership_changed = cutoff_new > cutoff_old and np.any(
            (self.train_y_clf[:-len(new_y)] <= cutoff_new)
            & (self.train_y_clf[:-len(new_y)] > cutoff_old))

        add_mask = new_y > cutoff_new
        if membership_changed:
            # rebuild the GP subset from scratch (points dropped out)
            x_gp, y_gp = self._filter_gp_subset()
            self._rebuild(x_gp, y_gp)
            log.debug(f"GP subset rebuilt: clf size {self.clf_data_size}, "
                      f"gp size {super().npoints}")
        elif np.any(add_mask):
            # pass host numpy straight through: GP.update keeps its host
            # mirror in sync from these without a device round-trip
            super().update(new_x[add_mask], new_y[add_mask])

    def _rebuild(self, x_gp, y_gp):
        fresh = GP(train_x=jnp.asarray(x_gp), train_y=jnp.asarray(y_gp),
                   noise=self.cfg.noise, kernel=self.cfg.kernel,
                   optimizer=self.optimizer_method,
                   lengthscales=self.lengthscales,
                   kernel_variance=self.kernel_variance,
                   lengthscale_bounds=self.cfg.lengthscale_bounds,
                   kernel_variance_bounds=self.cfg.kernel_variance_bounds,
                   kernel_variance_prior=self.cfg.kernel_variance_prior,
                   lengthscale_prior=self.cfg.lengthscale_prior,
                   tausq=self.tausq, tausq_bounds=self.cfg.tausq_bounds,
                   param_names=self.param_names,
                   input_warp=self.cfg.input_warp,
                   warp_bounds=self.cfg.warp_bounds)
        if self.cfg.input_warp:
            # carry the LEARNED warp across the rebuild (a fresh GP starts at
            # the identity; dropping it would silently un-warp the surrogate
            # until the next refit) and refactorize in warp space
            from .gp import _refresh_jit

            fresh.state = fresh.state._replace(log_wa=self.state.log_wa,
                                               log_wb=self.state.log_wb)
            fresh.state = _refresh_jit(fresh.state, fresh.cfg)
        self.state = fresh.state
        self._host_x, self._host_y = fresh._host_x, fresh._host_y

    # -------------------------------------------------------- random points

    def get_random_point(self, rng=None, nstd=None):
        """Classifier-aware random point: drawn from dataset points within a
        threshold of the incumbent (reference clf_gp.py:254-276)."""
        rng = rng if rng is not None else get_numpy_rng()
        if not self.use_clf:
            return super().get_random_point(rng=rng, nstd=nstd)
        threshold = (get_threshold_for_nsigma(nstd, self.ndim)
                     if nstd is not None else self.clf_threshold)
        valid = np.where(self.train_y_clf > self.train_y_clf.max() - threshold)[0]
        if valid.size == 0:
            return super().get_random_point(rng=rng, nstd=nstd)
        return self.train_x_clf[rng.choice(valid)]

    # --------------------------------------------------------- serialization

    def state_dict(self) -> Dict[str, Any]:
        state = super().state_dict()
        state.update({
            "train_x_clf": np.asarray(self.train_x_clf),
            "train_y_clf": np.asarray(self.train_y_clf).reshape(-1, 1),
            "clf_type": self.clf_type,
            "clf_settings": self.clf_settings,
            "clf_use_size": self.clf_use_size,
            "clf_update_step": self.clf_update_step,
            "probability_threshold": self.probability_threshold,
            "minus_inf": self.minus_inf,
            "clf_threshold": self.clf_threshold,
            "gp_threshold": self.gp_threshold,
            "use_clf": self.use_clf,
            "clf_params": None if self.clf_params is None else
            {k: np.asarray(v) for k, v in self.clf_params.items()
             if not isinstance(v, tuple)} | (
                {"layers": [(np.asarray(w), np.asarray(b))
                            for w, b in self.clf_params["layers"]]}
                if "layers" in (self.clf_params or {}) else {}),
            "clf_metrics": self.clf_metrics,
            "gp_class": "GPwithClassifier",
        })
        return state

    @classmethod
    def from_state_dict(cls, state: Dict[str, Any]) -> "GPwithClassifier":
        def _item(v):
            return v.item() if isinstance(v, np.ndarray) and v.shape == () else v

        ls_prior = _item(state.get("lengthscale_prior_spec"))
        kv_prior = _item(state.get("kernel_variance_prior_spec"))
        gp = cls(
            train_x=state["train_x_clf"],
            train_y=state["train_y_clf"],
            clf_type=str(_item(state["clf_type"])),
            clf_settings=_item(state.get("clf_settings")) or {},
            clf_use_size=int(_item(state["clf_use_size"])),
            clf_update_step=int(_item(state["clf_update_step"])),
            probability_threshold=float(_item(state["probability_threshold"])),
            minus_inf=float(_item(state["minus_inf"])),
            clf_threshold=float(_item(state["clf_threshold"])),
            gp_threshold=float(_item(state["gp_threshold"])),
            train_clf_on_init=False,
            noise=float(_item(state["noise"])),
            kernel=str(_item(state["kernel_name"])),
            optimizer=str(_item(state.get("optimizer_method", "lbfgs"))),
            lengthscales=state["lengthscales"],
            kernel_variance=float(_item(state["kernel_variance"])),
            lengthscale_bounds=tuple(np.asarray(state["lengthscale_bounds"]).tolist()),
            kernel_variance_bounds=tuple(np.asarray(state["kernel_variance_bounds"]).tolist()),
            kernel_variance_prior=kv_prior,
            lengthscale_prior=ls_prior,
            tausq=float(_item(state.get("tausq", 1.0))),
            tausq_bounds=tuple(np.asarray(
                state.get("tausq_bounds", (1e-4, 1e4))).tolist()),
            param_names=(list(np.asarray(state["param_names"]).tolist())
                         if state.get("param_names") is not None else None),
            optimizer_options=_item(state.get("optimizer_options")) or {},
            input_warp=bool(_item(state.get("input_warp", False))),
            warp_bounds=tuple(np.asarray(
                state.get("warp_bounds", (0.25, 4.0))).tolist()),
        )
        log_wa, log_wb = state.get("log_wa"), state.get("log_wb")
        if log_wa is not None and log_wb is not None and np.size(log_wa):
            from .gp import _refresh_jit

            gp.state = gp.state._replace(
                log_wa=jnp.asarray(np.asarray(log_wa, dtype=np.float64)),
                log_wb=jnp.asarray(np.asarray(log_wb, dtype=np.float64)))
            if gp.cfg.input_warp:
                gp.state = _refresh_jit(gp.state, gp.cfg)
        gp.use_clf = bool(_item(state.get("use_clf", False)))
        clf_params = _item(state.get("clf_params"))
        gp.clf_metrics = _item(state.get("clf_metrics")) or {}
        if clf_params is not None:
            params = {}
            for k, v in dict(clf_params).items():
                if k == "layers":
                    params[k] = tuple((jnp.asarray(w), jnp.asarray(b)) for w, b in v)
                else:
                    params[k] = jnp.asarray(v)
            gp.clf_params = params
            predict_fn = CLASSIFIER_REGISTRY[gp.clf_type]["predict_fn"]
            gp._clf_predict = predict_fn(params, gp.clf_settings,
                                         d=gp.train_x_clf.shape[1])
        from .gp import _restore_fit_basins

        _restore_fit_basins(gp, state)
        return gp

    def copy(self) -> "GPwithClassifier":
        return self.__class__.from_state_dict(self.state_dict())
