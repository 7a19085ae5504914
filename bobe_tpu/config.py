"""Global configuration for bobe_tpu.

The reference implementation (see /root/reference/BOBE/bo.py:5, gp.py:7) hard-enables
float64 at import time because exact-GP Cholesky factorizations at noise=1e-8 are
ill-conditioned in float32. We keep that default for numerical parity, but expose a
dtype policy so the hot device paths (Gram, Cholesky, acquisition sweeps, samplers)
can run in float32 on TPU where the MXU is ~10x faster, paired with an adaptive
jitter ladder (see ops/chol.py) that restores stability.

Usage::

    import bobe_tpu
    bobe_tpu.config.set_compute_dtype("float32")   # TPU fast path
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Enable x64 before any array is created (parity with reference gp.py:7).
jax.config.update("jax_enable_x64", True)


def _host_fingerprint() -> str:
    """Short fingerprint of the host CPU (ISA feature set + model).

    XLA:CPU cache entries are AOT-compiled for the exact host ISA; the cache
    KEY does not include host features, so an entry written on one machine
    can be loaded on another with a different feature set — which SIGILLs or
    SIGSEGVs inside cpu_aot_loader at deserialization (observed in this repo
    when a round migrated hosts: jax compilation_cache.get_executable_and_time
    crashed the test suite). Scoping the cache directory by host fingerprint
    makes foreign-ISA entries unreachable by construction. TPU entries are
    serialized for the accelerator and survive host hops — migrate them into
    a new host's directory with tools/migrate_jax_cache.py.
    """
    # x86 exposes "flags"/"model name"; aarch64 exposes "Features"/
    # "CPU implementer"/"CPU part" — matching only the x86 keys hashed the
    # same empty blob on every ARM host, defeating the foreign-ISA scoping.
    # First occurrence per key, file order, early exit once both x86 keys
    # are present. The GDS (Downfall) mitigation state is folded in as well:
    # XLA's CPU tuning keys on it (+prefer-no-gather/+prefer-no-scatter in
    # the AOT target features), and a VM can migrate between physical nodes
    # whose cpuinfo is byte-identical but whose mitigation state differs —
    # observed in this repo as cpu_aot_loader feature-mismatch errors on
    # entries written under the same fingerprint (BENCH_NOTES round 3).
    # The CPUID identity lines (cpu family / model / stepping) are folded in
    # too: LLVM's host detection keys its tuning (including the GDS-driven
    # prefer-no-gather choice) on the microarchitecture model, while cloud
    # VMs report a GENERIC "model name" ("Intel(R) Xeon(R) Processor @
    # 2.10GHz") and identical flags across different physical generations —
    # observed in round 3 as an Ice-Lake-compiled (+prefer-no-gather) entry
    # loaded on an Emerald-Rapids node under one fingerprint even with the
    # GDS sysfs state keyed ("Not affected" on both).
    return _host_fingerprint_from(
        "/proc/cpuinfo",
        "/sys/devices/system/cpu/vulnerabilities/gather_data_sampling")


def _host_fingerprint_from(cpuinfo_path: str, vuln_path: str = None) -> str:
    """See _host_fingerprint; split out so tests can feed cpuinfo dialects."""
    import hashlib

    _KEYS = ("flags", "model name", "cpu family", "model", "stepping",
             "Features", "CPU implementer", "CPU part")
    try:
        seen: dict = {}
        order = []
        with open(cpuinfo_path) as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in _KEYS and key not in seen:
                    seen[key] = line.strip()
                    order.append(key)
                # no early exit: on cpuinfo dialects where 'flags' precedes
                # the identity lines, breaking at flags+model-name silently
                # dropped keys from the fingerprint; the file is small (the
                # first-occurrence filter already ignores repeat blocks)
        blob = "|".join(seen[k] for k in order)
        if not blob:  # unknown /proc/cpuinfo dialect: fall back, never ''
            raise OSError("no recognizable cpuinfo lines")
    except Exception:  # pragma: no cover - non-Linux
        import platform

        blob = platform.machine() + platform.processor()
    if vuln_path:
        try:
            with open(vuln_path) as f:
                blob += "|gds:" + f.read().strip()
        except Exception:  # file absent (old kernels, ARM): cpuinfo-only
            pass
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


# Persistent XLA compilation cache: compile latency dominates small-problem
# wall time in this environment, and the BO loop's kernels are re-used across
# runs. Scoped per host CPU fingerprint (see _host_fingerprint). Opt out with
# BOBE_TPU_NO_COMP_CACHE=1; BOBE_TPU_COMP_CACHE_DIR overrides the exact
# directory (no fingerprint scoping applied — caller's responsibility).
if not os.environ.get("BOBE_TPU_NO_COMP_CACHE"):
    _cache_dir = os.environ.get("BOBE_TPU_COMP_CACHE_DIR")
    if not _cache_dir:
        _cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache", "hosts", _host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax versions
        pass


def _cpu_cache_put_allowed(platform: str, compile_time) -> bool:
    """Persist-cache policy for a just-compiled executable (see the guard
    below): everything passes except XLA:CPU executables whose compile time
    exceeds BOBE_TPU_CPU_CACHE_MAX_COMPILE_S (default 10 s)."""
    try:
        limit = float(os.environ.get("BOBE_TPU_CPU_CACHE_MAX_COMPILE_S",
                                     "10"))
        return not (platform == "cpu" and compile_time is not None
                    and compile_time > limit)
    except Exception:  # pragma: no cover - guard must never break puts
        return True


def _install_cpu_cache_put_guard() -> None:
    """Skip persisting very large XLA:CPU executables.

    LoadedExecutable.serialize() for XLA:CPU AOT results is unreliable for
    very large executables: observed a nondeterministic SIGSEGV inside
    serialize() while persisting a ~20 s-compile NUTS mega-graph mid-test-
    suite (and deserialize() of foreign-ISA CPU entries also segfaults —
    that side is handled by the host-fingerprint cache scoping above). TPU
    executables round-trip fine. Compile time is the only pre-serialize
    proxy for executable size, so CPU executables that took longer than
    BOBE_TPU_CPU_CACHE_MAX_COMPILE_S (default 10 s) are recompiled per
    process instead of persisted. Raise the threshold at your own risk.
    """
    try:
        from jax._src import compilation_cache as _cc
    except Exception:  # pragma: no cover - jax internals moved
        return
    if getattr(_cc, "_bobe_cpu_put_guard", False):  # idempotent (reimports)
        return
    _orig_put = _cc.put_executable_and_time

    def _guarded_put(cache_key, module_name, executable, backend,
                     compile_time):
        if not _cpu_cache_put_allowed(getattr(backend, "platform", ""),
                                      compile_time):
            return None
        return _orig_put(cache_key, module_name, executable, backend,
                         compile_time)

    _cc.put_executable_and_time = _guarded_put
    _cc._bobe_cpu_put_guard = True


def _cpu_cache_get_allowed(platform: str, entry_size: int) -> bool:
    """Read-side twin of _cpu_cache_put_allowed: on the CPU backend, treat
    entries above BOBE_TPU_CPU_CACHE_MAX_ENTRY_MB (compressed, default 4 MB)
    as cache misses instead of deserializing them. deserialize_executable()
    of very large XLA:CPU AOT results crashes (SIGSEGV/SIGABRT) — observed
    repeatedly on NUTS/NS mega-graph entries mid-test-suite — and the put
    guard already stops NEW large CPU entries, so this only shields against
    entries written before the guard or by other tools."""
    try:
        limit_mb = float(os.environ.get("BOBE_TPU_CPU_CACHE_MAX_ENTRY_MB",
                                        "4"))
        return not (platform == "cpu" and entry_size > limit_mb * 1e6)
    except Exception:  # pragma: no cover - guard must never break gets
        return True


def _install_cpu_cache_get_guard() -> None:
    """See _cpu_cache_get_allowed. Oversized CPU entries read as misses; the
    graph recompiles in-process (safe) and the put guard keeps it out of the
    persistent cache."""
    try:
        from jax._src import compilation_cache as _cc
    except Exception:  # pragma: no cover - jax internals moved
        return
    if getattr(_cc, "_bobe_cpu_get_guard", False):  # idempotent (reimports)
        return
    _orig_get = _cc.get_executable_and_time

    try:
        from jax._src.lru_cache import _CACHE_SUFFIX
    except Exception:  # pragma: no cover - jax internals moved
        _CACHE_SUFFIX = "-cache"

    def _entry_size(cache, cache_key):
        """Entry size in bytes, or None if absent/unknowable. Prefers a
        stat() on the on-disk entry (jax's LRUCache stores
        ``<key><_CACHE_SUFFIX>``) — the read-probe fallback pays the full
        entry read a second time when _orig_get fetches it for real."""
        base = getattr(cache, "path", None) or getattr(cache, "_path", None)
        if base is not None:
            for name in (f"{cache_key}{_CACHE_SUFFIX}", cache_key):
                p = os.path.join(str(base), name)
                if os.path.exists(p):
                    try:
                        return os.path.getsize(p)
                    except OSError:
                        pass
            return None  # definitive miss: skip the read-probe
        raw = cache.get(cache_key)
        return None if raw is None else len(raw)

    def _guarded_get(cache_key, compile_options, backend, executable_devices):
        if getattr(backend, "platform", "") == "cpu":
            try:
                cache = _cc._get_cache(backend)
                size = _entry_size(cache, cache_key) if cache is not None else None
            except Exception:  # pragma: no cover - probe must never break
                size = None
            if size is not None and not _cpu_cache_get_allowed("cpu", size):
                return None, None
        return _orig_get(cache_key, compile_options, backend,
                         executable_devices)

    _cc.get_executable_and_time = _guarded_get
    _cc._bobe_cpu_get_guard = True


if not os.environ.get("BOBE_TPU_NO_COMP_CACHE"):
    _install_cpu_cache_put_guard()
    _install_cpu_cache_get_guard()

# None = "not yet resolved": the backend-dependent default (f32 on TPU, f64
# on CPU) is probed lazily on first use — see _resolve_default_dtype for why
# import must not touch the backend.
_COMPUTE_DTYPE = None

# Row-count padding granularity for GP buffers. 128 matches the TPU lane width /
# MXU tile so padded Gram matrices map cleanly onto hardware tiles.
PAD_MULTIPLE = 128

# Floor used when clipping predicted variances (reference gp.py:16).
SAFE_NOISE_FLOOR = 1e-12


def fit_f64_max_cap() -> int:
    """Largest padded GP capacity at which the hyperparameter FIT runs in
    float64 even when the compute dtype is float32 (TPU). Measured on the
    planck-like parity problem (BENCH_NOTES round 2): the f32 objective's
    jitter floor over-smooths selection in curved low-noise regimes —
    TPU runs read |dlogZ| 0.184 (raw f32) / 0.102 (f32 + f64 polish) /
    0.001 (f64 fits), and the f64-fit run also converged in the FEWEST
    evaluations (216 vs 356/484), making it the best wall-clock-to-accuracy
    default despite ~10 ms/eval emulated-f64 Choleskys at these caps.
    Above the threshold (big toy/bench sets, f32 parity verified there)
    fits stay f32. Override with BOBE_TPU_F64_FIT_MAX_CAP (0 disables).

    NOTE: this default DELIBERATELY equals fit_polish_max_cap() — any cap
    small enough to polish already runs a full f64 fit, so the polish branch
    only engages when BOBE_TPU_F64_FIT_MAX_CAP is lowered below the polish
    cap (tests/test_fast_path.py pins that engagement). Keep the two in sync
    when changing either default."""
    return int(os.environ.get("BOBE_TPU_F64_FIT_MAX_CAP", 768))


def fit_polish_max_cap() -> int:
    """Largest padded GP capacity at which the f64 hyperparameter polish
    runs after an f32 fit. With the default fit_f64_max_cap covering the
    same range, the polish is the quality fallback for setups that disable
    small-cap f64 fits for speed: measured on the planck-like parity
    problem, |dlogZ| = 0.030 at 40 polish iterations vs 0.184 raw f32 and
    0.001 full f64 (BENCH_NOTES). Override with BOBE_TPU_POLISH_MAX_CAP
    (0 disables)."""
    return int(os.environ.get("BOBE_TPU_POLISH_MAX_CAP", 768))


def device_refresh_max_cap() -> int:
    """Largest padded GP capacity at which the post-fit f64 state refresh
    runs ON-DEVICE (emulated f64) instead of host+upload.

    Both routes compute the identical f64 set_hyperparams graph; the choice
    is pure transfer economics. Measured at cap 1024 on the tunneled TPU
    (round 3): on-device emulated refresh 0.10 s with ZERO host traffic vs
    host-native chol 0.06 s + 8.4 MB f64 chol upload 0.14 s. Emulated f64
    scales O(cap^3) while the upload scales O(cap^2), so the host route wins
    at large caps (cap 4096: ~4.5 s device vs ~1.9 s host+upload). Override
    with BOBE_TPU_DEVICE_REFRESH_MAX_CAP (0 forces the host route whenever
    available)."""
    return int(os.environ.get("BOBE_TPU_DEVICE_REFRESH_MAX_CAP", 1024))


def host_fit_method() -> str:
    """Optimizer for host-routed f64 hyperparameter fits: 'scipy' (default)
    or 'lockstep'.

    'scipy' = serial scipy L-BFGS-B per restart with its adaptive zoom line
    search — the reference's own optimizer pattern (optim.py:249). 'lockstep'
    = the vmapped fixed-trip-line-search device loop run on the CPU backend.
    Measured on a 1-core host at cap 512, d=8 (BENCH_NOTES round 3 cap-
    scaling sweep): lockstep 10.2 s/fit vs scipy ~0.8 s — the lockstep design
    buys MXU batching that a host CPU cannot exploit, while paying fixed-trip
    line-search evals and run-until-last-lane-retires scheduling that scipy's
    adaptive search avoids. On a many-core host the batched path can win
    back; hence the knob. Override with BOBE_TPU_HOST_FIT_METHOD=lockstep."""
    return os.environ.get("BOBE_TPU_HOST_FIT_METHOD", "scipy")


def fit_f64_select() -> bool:
    """Exact-f64 model selection across the f32 fit's restart endpoints.

    The f32 objective's relative jitter floor (models/gp.neg_mll) regularizes
    identically WITHIN a basin but can invert the ranking BETWEEN basins:
    measured at d=30/cap=1280, exact f64 MLL preferred the good basin by
    ~1400 nats while the floored f32 objective preferred a degenerate one
    (lengthscales pinned, amp ~7e4) by ~1600 — an evidence-catastrophic fit
    whenever a restart finds that basin. With this on (default), the descent
    stays f32 on the MXU and only the R-way endpoint argmin is rescored
    under the exact f64 MLL (host-routed on TPU). Only engages at caps
    above fit_f64_max_cap (smaller caps already fit fully in f64).
    Override with BOBE_TPU_F64_SELECT=0."""
    return os.environ.get("BOBE_TPU_F64_SELECT", "1") != "0"


def predict_chunk() -> int:
    """Largest batch a single batched-predict device call may carry.

    Batched GP prediction is called with UNBOUNDED batch sizes — the NS
    evidence-bound integrals evaluate sigma at every dead point (~1e5-1e6
    for deep high-d runs) and classifier live-seeding proposes 5000*d points
    per try. One device call at that size builds a (cap, m) cross kernel
    plus solve intermediates and OOMs HBM (measured: 28.3 GB requested at
    cap=2048, d=30, m=142800 on a 16 GB v5e). Larger batches are split into
    chunks of this size (the tail padded, so exactly one graph compiles).
    At the 16384 default the peak per-call footprint stays ~2-3 GB at
    cap 2048 f64. Override with BOBE_TPU_PREDICT_CHUNK (0 disables)."""
    return int(os.environ.get("BOBE_TPU_PREDICT_CHUNK", 16384))


def fit_polish_iters() -> int:
    """L-BFGS iterations for the f64 polish (BOBE_TPU_POLISH_ITERS).
    40 is the measured sweet spot (see fit_polish_max_cap): ~1/5 the cost
    of a full f64 fit for most of its accuracy."""
    return int(os.environ.get("BOBE_TPU_POLISH_ITERS", 40))


def set_compute_dtype(dtype) -> None:
    """Set the dtype used for device-side GP/sampler math ('float32'|'float64')."""
    global _COMPUTE_DTYPE
    dt = jnp.dtype(dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        raise ValueError(f"compute dtype must be float32 or float64, got {dtype}")
    _COMPUTE_DTYPE = jnp.float32 if dt == jnp.dtype(jnp.float32) else jnp.float64


def _resolve_default_dtype():
    """Resolve the backend-dependent default compute dtype, LAZILY.

    Default policy: float32 hot-path on TPU (MXU-native; f64 is emulated and
    both compiles and runs an order of magnitude slower there), float64 on
    CPU (parity with the reference). The GP state and the evidence integrals
    stay float64 either way. Override with BOBE_TPU_DTYPE.

    This probe MUST NOT run at import: jax.default_backend() initializes the
    platform, and importing bobe_tpu happens in processes that must never
    touch an accelerator — notably MultiprocessPool workers (a second client
    on a single-process TPU runtime deadlocks; see parallel/pool._mp_init) —
    and making import itself pay the multi-second TPU client bring-up is
    wrong even in the orchestrator.
    """
    global _COMPUTE_DTYPE
    if _COMPUTE_DTYPE is not None:
        return _COMPUTE_DTYPE
    dt = jnp.float64
    try:
        if jax.default_backend() == "tpu":
            dt = jnp.float32
    except Exception:  # pragma: no cover - backend probing must never raise
        pass
    _COMPUTE_DTYPE = dt
    return dt


def compute_dtype():
    """Current compute dtype for hot-path kernels."""
    return _COMPUTE_DTYPE if _COMPUTE_DTYPE is not None else _resolve_default_dtype()


def is_x32() -> bool:
    return compute_dtype() == jnp.float32


_env_dt = os.environ.get("BOBE_TPU_DTYPE")
if _env_dt:
    set_compute_dtype(_env_dt)
