"""Background compile prewarming for cold-process runs.

Measured problem (BENCH_NOTES round 3): on tunneled TPU setups a cold process
pays ~10 compile-cache loads over the relay, SERIALLY, one per hot graph the
BO loop reaches (EHMC cold + warm, WIP sweep/batch/refine, GP fit + polish,
NS acq/convergence, LOO, predict) — 100+ s of a quickstart wall that executes
~60 s of actual phases. The loads are independent IO-bound operations, so the
fix is classic pipelining: at ``BOBE.run()`` start a small daemon-thread pool
triggers every first-iteration graph through the SAME lru-cached jitted entry
points the loop will hit (same static keys, same shapes -> the loop's later
calls are in-process cache hits), while the main thread proceeds with its own
first compile. Near a GP capacity-bucket crossing the same machinery warms the
next bucket's graphs one batch ahead of the growth (``prewarm_next_bucket``),
removing the mid-run recompile stall as well.

Correctness containment: prewarm calls are read-only with respect to the live
run — mutating entry points (GP.update / fit) run on a throwaway ``gp.copy()``,
every dummy execution draws from private RNGs (never the global seed
registry), and results are discarded. A prewarmed run is bit-identical to an
unprewarmed one; only compile timing moves. Failures are logged at debug
level and never propagate (a prewarm can only be a no-op, not a crash).

No reference counterpart: the reference is a CPU/MPI code whose scipy fits
and dynesty loops have no compile step (cf. /root/reference/BOBE/pool.py);
compile latency is a TPU-native concern.
"""
from __future__ import annotations

import os
import threading
import time
from typing import Optional

import numpy as np

from .log import get_logger

log = get_logger("prewarm")

_PREWARM_SEED = 0x5EED


def prewarm_enabled() -> bool:
    """Default: on for accelerator backends (where compiles are relay-priced),
    off on CPU (tests/toys would pay dummy-execution cost for no win).
    Override either way with BOBE_TPU_PREWARM=1/0."""
    v = os.environ.get("BOBE_TPU_PREWARM")
    if v is not None:
        return v != "0"
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - no backend at all
        return False


class Prewarmer:
    """Tracks named daemon prewarm threads; join-able for tests/teardown."""

    def __init__(self):
        self._threads = []
        self._lock = threading.Lock()
        self.errors = {}  # name -> repr(exc), for tests/diagnostics

    def submit(self, name: str, fn) -> None:
        def _run():
            t0 = time.time()
            try:
                fn()
                log.debug(f"prewarm[{name}] done in {time.time() - t0:.1f}s")
            except Exception as e:  # never propagate into the run
                with self._lock:
                    self.errors[name] = repr(e)
                log.debug(f"prewarm[{name}] failed (ignored): {e!r}")

        t = threading.Thread(target=_run, name=f"prewarm-{name}", daemon=True)
        t.start()
        with self._lock:
            self._threads.append(t)

    def wait(self, timeout: Optional[float] = None) -> bool:
        """Join all submitted threads. Returns True if all finished."""
        deadline = None if timeout is None else time.time() + timeout
        for t in list(self._threads):
            t.join(None if deadline is None else max(0.0, deadline - time.time()))
        return not any(t.is_alive() for t in self._threads)


# --------------------------------------------------------------------- dummies

def _synthetic_targets(gp, rng, n: int) -> np.ndarray:
    """RAW targets strictly below the incumbent max (so no clf-GP
    subset-rebuild path triggers) yet strictly inside any classifier-GP's
    ``gp_threshold`` window (so the points enter the GP subset instead of
    being silently filtered — a filtered point warms the WRONG graphs).
    train_y is standardized and its max can exceed the raw incumbent, so the
    anchor must be the raw max."""
    y_max = float(np.max(np.asarray(gp.train_y_raw))) if gp.gp_size else 0.0
    thr = getattr(gp, "gp_threshold", None)
    # offset band [off, 2*off] below the max; 2*off < gp_threshold keeps the
    # points inside the subset window for ANY threshold (incl. thr <= 2)
    off = 0.5 if not thr else min(0.5, float(thr) / 4.0)
    return y_max - off - rng.uniform(0.0, off, size=n)


def _bucket_crossing_copy(gp, batch: int):
    """A throwaway ``gp.copy()`` extended with synthetic points until its
    padded capacity grows into the NEXT bucket. Because it is a real copy it
    carries the exact production config — classifier gating, input warp,
    priors, dtype policy — so every graph compiled against it (static keys =
    cfg + padded shapes) is a later cache hit for the live GP after growth; a
    synthetic plain-GP stand-in would silently warm the WRONG graphs for
    clf-gated or warped runs.

    Points are added in ``batch``-wide chunks: production only ever extends
    by ``batch_size``, and jitted extend graphs are shape-keyed — a single
    ``need``-wide update would compile a one-off graph no production call
    reuses (and a different one at every crossing)."""
    dummy = gp.copy()
    cap = dummy.state.x.shape[0]
    need = cap - dummy.gp_size + 1
    rng = np.random.default_rng(_PREWARM_SEED + 4)
    for _ in range((need + batch - 1) // batch):
        new_x = rng.uniform(0.05, 0.95, size=(batch, gp.ndim))
        dummy.update(new_x, _synthetic_targets(gp, rng, batch))
    return dummy


def _fit_plan(n: int):
    """(maxiter, n_restarts) the adaptive refit schedule will use at ``n``
    active points — must mirror bo.update_gp's thresholds exactly for the
    compiled fit graph (static key includes maxiter) to be a later cache hit."""
    if n < 200:
        return 300, 8
    if n < 750:
        return 250, 4
    return 200, 4


# ------------------------------------------------------------------ the warms

def _warm_sampler(gp, settings: dict) -> None:
    """EHMC/NUTS refresh graphs: the warm (steady-state) variant, plus the
    cold variant implicitly if the synthetic warm kernel is rejected. The
    run's FIRST refresh (cold) is compiled by the main thread concurrently."""
    import jax

    from ..acquisition import get_mc_samples

    method = settings.get("mc_points_method", "EHMC")
    if method not in ("EHMC", "NUTS"):
        return
    d = gp.ndim
    rng = np.random.default_rng(_PREWARM_SEED + 1)
    key = jax.random.PRNGKey(_PREWARM_SEED + 1)
    kw = dict(warmup_steps=settings.get("num_hmc_warmup"),
              num_samples=settings.get("num_hmc_samples", 1024),
              thinning=settings.get("thinning"),
              num_chains=settings.get("num_chains"),
              method=method, np_rng=rng, rng_key=key)
    if method == "EHMC":
        from ..samplers import get_ehmc_settings

        nc, _, _ = get_ehmc_settings(d, num_chains=settings.get("num_chains"),
                                     num_samples=settings.get("num_hmc_samples"),
                                     warmup_steps=settings.get("num_hmc_warmup"))
        z = rng.normal(size=(nc, d))
        warm = {"kind": "ehmc", "num_chains": nc, "ndim": d,
                "dense_mass": True, "temp": 1.0,
                "step_size": np.asarray(0.5),
                "mass_inv": np.eye(d), "mass_chol": np.eye(d),
                "last_z": z}
    else:
        nc = settings.get("num_chains") or 4
        z = rng.normal(size=(nc, d))
        warm = {"kind": "nuts", "num_chains": nc, "ndim": d,
                "dense_mass": True, "temp": 1.0,
                "step_size": np.full((nc,), 0.5),
                "mass_inv": np.tile(np.eye(d), (nc, 1, 1)),
                "mass_chol": np.tile(np.eye(d), (nc, 1, 1)),
                "last_z": z}
    get_mc_samples(gp, warm_state=warm, **kw)


def _warm_acquisition(gp, settings: dict) -> None:
    """AOT-compile (no execution) the WIP sweep / fused greedy batch / refine
    cores for the current capacity bucket and the run's mc_points_size."""
    import jax
    import jax.numpy as jnp

    from .. import acquisition as acq
    from ..parallel.mesh import production_mesh

    mesh = production_mesh()
    n_mc = int(settings.get("mc_points_size", 64))
    n_batch = int(settings.get("batch_size", 4))
    d = gp.ndim
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), gp.state)
    mc = jax.ShapeDtypeStruct((n_mc, d), jnp.dtype("float64"))
    for use_std in settings.get("use_std_set", (True,)):
        acq._wip_sweep_core(gp.cfg, use_std, acq.SWEEP_DTYPE,
                            mesh).lower(sds, mc).compile()
        if n_batch > 1:
            acq._wip_batch_core(gp.cfg, use_std, n_batch, acq.SWEEP_DTYPE,
                                mesh).lower(sds, mc).compile()
        if gp.npoints <= acq.REFINE_MAX_N:  # polish skipped above (prod. :333)
            x0 = jax.ShapeDtypeStruct((1, d), jnp.dtype("float64"))
            sdt = jnp.dtype(acq.SWEEP_DTYPE)
            V = jax.ShapeDtypeStruct((gp.state.x.shape[0], n_mc), sdt)
            var = jax.ShapeDtypeStruct((n_mc,), sdt)
            acq._wip_refine_core(gp.cfg, use_std, 100).lower(
                sds, x0, mc, V, var).compile()


def _warm_fit_and_update(gp, settings: dict) -> None:
    """GP extend + hyperparameter-fit graphs on a throwaway copy (both entry
    points mutate facade state). Covers the f32 fit, its f64 polish, and the
    host-routed f64 path — whichever combination the dtype policy selects."""
    rng = np.random.default_rng(_PREWARM_SEED + 2)
    d = gp.ndim
    batch = int(settings.get("batch_size", 4))
    dummy = gp.copy()
    new_x = rng.uniform(0.05, 0.95, size=(batch, d))
    # targets just below the incumbent RAW max but inside the subset window:
    # a bowl target could exceed the incumbent and compile the subset-rebuild
    # graph instead of the production batch-update graph, and a too-low one
    # is filtered out of a tight-threshold clf-GP entirely
    dummy.update(new_x, _synthetic_targets(dummy, rng, batch))
    maxiter, n_restarts = _fit_plan(dummy.npoints)
    dummy.fit(n_restarts=n_restarts, maxiter=maxiter, rng=rng)


def _warm_ei(gp, settings: dict) -> None:
    """AOT-compile the EI/LogEI restart optimizer for the run_EI loop
    (bo.run_EI: n_batch=1, n_restarts=50, maxiter=300)."""
    import jax
    import jax.numpy as jnp

    from .. import acquisition as acq

    d = gp.ndim
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), gp.state)
    x0 = jax.ShapeDtypeStruct((50, d), jnp.dtype("float64"))
    scalar = jax.ShapeDtypeStruct((), jnp.dtype("float64"))
    for use_log in settings.get("ei_modes", ()):
        acq._ei_objective_core(gp.cfg, use_log, 300).lower(
            sds, x0, scalar, scalar).compile()


def _warm_nested(gp, settings: dict, mode: str, nlive: Optional[int] = None) -> None:
    """Convergence/acq-mode NS graph (plus the LOO-calibration and batched
    predict-variance graphs its bounds integration uses) by dummy execution:
    the NS while_loop's static key spans (nlive, kill_k, repeats, cap), so a
    real run through ``samplers.nested_sampling`` is the only robust way to
    hit the exact production graph. ``maxcall`` is TRACED, so capping it at
    64 compiles the identical loop while executing only ~one kill batch —
    the prewarm never pays a full NS run's device time."""
    import jax

    from ..samplers import nested_sampling

    rng = np.random.default_rng(_PREWARM_SEED + 3)
    key = jax.random.PRNGKey(_PREWARM_SEED + 3)
    nested_sampling(gp=gp, mode=mode, dlogz=0.01 if mode != "acq" else 0.02,
                    equal_weights=(mode == "acq"), nlive=nlive,
                    maxcall=64, warn_truncation=False,
                    rng=rng, rng_key=key)


# ------------------------------------------------------------------- entry API

def _run_settings(bo, acq_names) -> dict:
    wip = [a for a in acq_names if a.lower() in ("wipv", "wipstd")]
    return {
        "mc_points_method": getattr(bo, "mc_points_method", "EHMC"),
        "num_hmc_warmup": getattr(bo, "num_hmc_warmup", None),
        "num_hmc_samples": getattr(bo, "num_hmc_samples", 1024),
        "thinning": getattr(bo, "hmc_thinning", None),
        "num_chains": getattr(bo, "hmc_num_chains", None),
        "mc_points_size": getattr(bo, "mc_points_size", 64),
        "batch_size": getattr(bo, "batch_size", 4),
        "fit_n_points": getattr(bo, "fit_n_points", 10),
        "wip": bool(wip),
        "use_std_set": tuple(sorted({a.lower() == "wipstd" for a in wip}))
                       or (True,),
        "ei_modes": tuple(sorted({a.lower() == "logei" for a in acq_names
                                  if a.lower() in ("ei", "logei")})),
    }


def prewarm_run(bo, acq_names=("wipstd",)) -> Prewarmer:
    """Fire-and-forget warms for every graph the first BO iterations touch.
    Called at ``BOBE.run`` start; returns the Prewarmer (join-able)."""
    settings = _run_settings(bo, acq_names)
    gp = bo.gp
    w = Prewarmer()
    w.submit("fit", lambda: _warm_fit_and_update(gp, settings))
    if settings["wip"]:
        w.submit("sampler", lambda: _warm_sampler(gp, settings))
        w.submit("acquisition", lambda: _warm_acquisition(gp, settings))
        w.submit("ns-convergence",
                 lambda: _warm_nested(gp, settings, "convergence"))
    if settings["ei_modes"]:
        w.submit("ei", lambda: _warm_ei(gp, settings))
    return w


def prewarm_next_bucket(bo) -> Optional[Prewarmer]:
    """When the next acquisition batch would cross the GP's padding-capacity
    bucket, compile the NEXT bucket's graphs now, in the background — by the
    time the growth happens the loop's calls are cache hits instead of a
    multi-graph recompile stall. Returns the Prewarmer when triggered."""
    gp = bo.gp
    cap = gp.state.x.shape[0]
    batch = int(getattr(bo, "batch_size", 4))
    lookahead = max(2 * batch, 8)
    if gp.gp_size + lookahead <= cap:
        return None
    max_gp = int(getattr(bo, "max_gp_size", 10**9))
    if gp.gp_size >= max_gp:  # growth cannot happen; run is about to stop
        return None
    acq_names = [getattr(getattr(bo, "acquisition", None), "name", "wipstd")]
    settings = _run_settings(bo, acq_names)
    batch = int(getattr(bo, "batch_size", 4))
    # the dummy build itself is expensive (device fetch of the state_dict +
    # chunked extends across the bucket boundary), so it too runs on the
    # background threads: the FIRST warm to run builds it under a lock, the
    # rest reuse it. Building off-thread is read-only with respect to the
    # live GP (state pytrees are immutable; state_dict only reads), so a
    # concurrent production update can at worst make this prewarm a no-op.
    box: dict = {}
    box_lock = threading.Lock()

    def _dummy():
        with box_lock:
            if "gp" not in box:
                box["gp"] = _bucket_crossing_copy(gp, batch)
            return box["gp"]

    w = Prewarmer()
    w.submit("next-fit", lambda: _warm_fit_and_update(_dummy(), settings))
    if settings["wip"]:
        w.submit("next-sampler", lambda: _warm_sampler(_dummy(), settings))
        w.submit("next-acquisition",
                 lambda: _warm_acquisition(_dummy(), settings))
        w.submit("next-ns",
                 lambda: _warm_nested(_dummy(), settings, "convergence"))
    return w


def prewarm_boot_sync(d: int, max_gp_size: int = 256, batch: int = 4,
                      settings: Optional[dict] = None) -> list:
    """Synchronous boot-time warm for a d-dimensional problem: walk a
    synthetic GP through every padding bucket up to ``max_gp_size``, warming
    the full first-touch graph set (fit/update, sampler refresh, WIP
    sweep/batch/refine, acq- and convergence-mode NS) at each bucket.

    Device-server boot path (``python -m bobe_tpu.server --prewarm-d D``):
    unlike ``prewarm_run`` this runs on the CALLING thread — at boot there is
    nothing to overlap with, and a request arriving mid-prewarm should find
    the graphs loaded, not race the loaders. Graphs are keyed on
    (config, padded shapes), so a default-config plain-GP walk covers
    default-config runs of the same dimension; runs with a classifier-GP,
    input warp, or non-default sizes warm their remaining graphs on first
    use as usual. Returns the list of warmed bucket capacities."""
    import jax.numpy as jnp

    from ..models.gp import GP

    s = {"mc_points_method": "EHMC", "num_hmc_warmup": None,
         "num_hmc_samples": 1024, "thinning": None, "num_chains": None,
         "mc_points_size": 64, "batch_size": batch, "fit_n_points": 10,
         "wip": True, "use_std_set": (True,), "ei_modes": ()}
    s.update(settings or {})
    rng = np.random.default_rng(_PREWARM_SEED + 9)
    n0 = 16
    x = rng.uniform(0.05, 0.95, size=(n0, int(d)))
    y = -np.sum(((x - 0.5) / 0.25) ** 2, axis=1)
    gp = GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y))
    warmed = []
    while True:
        cap = int(gp.state.x.shape[0])
        t0 = time.time()
        _warm_fit_and_update(gp, s)
        _warm_sampler(gp, s)
        _warm_acquisition(gp, s)
        _warm_nested(gp, s, "acq")
        _warm_nested(gp, s, "convergence")
        warmed.append(cap)
        log.info(f"boot prewarm: bucket cap={cap} done in "
                 f"{time.time() - t0:.1f} s")
        if cap >= int(max_gp_size):
            break
        # grow into the next bucket with production-shaped batch updates
        need = cap - gp.gp_size + 1
        for _ in range((need + batch - 1) // batch):
            new_x = rng.uniform(0.05, 0.95, size=(batch, int(d)))
            gp.update(new_x, _synthetic_targets(gp, rng, batch))
    return warmed
