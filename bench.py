"""Headline benchmark: GP refit + acquisition cycle at 1e3 training points.

North star (BASELINE.json): >=20x faster than the CPU reference for one
"cycle" = GP hyperparameter refit + evidence-weighted acquisition sweep, at
N=1024 training points, |dlogZ| parity checked separately by the test suite.

Methodology
-----------
The reference cannot run here (dynesty/getdist are not installed), so the
baseline is an in-process, architecture-faithful emulation of its compute
pattern, run on the CPU backend in a subprocess:
  * refit: scipy L-BFGS-B, 4 restarts run serially, each objective evaluation
    a full O(N^3) Cholesky MLL (reference optim.py:249-358 + gp.py:385-437);
  * acquisition: per-candidate rank-1 Cholesky extension + (N+1) x n_mc
    triangular solve, mapped over the MC pool (reference gp.py:552-576,
    acquisition.py:390-397 via lax.map).
Both sides perform the same optimizer work (same restarts and iteration cap).

Ours runs the TPU-native path: one jitted fit with all restarts vmapped into
batched device linear algebra + the single-kernel batched WIP sweep
(ops/fantasy.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_TRAIN = 1024
NDIM = 8
N_MC = 64
N_RESTARTS = 4
MAXITER = 30
SEED = 0


def _make_data():
    import numpy as np

    rng = np.random.default_rng(SEED)
    x = rng.uniform(size=(N_TRAIN, NDIM))
    y = -0.5 * np.sum(((x - 0.5) / 0.2) ** 2, axis=1)
    y += 0.01 * rng.normal(size=N_TRAIN)
    mc = rng.uniform(size=(N_MC, NDIM))
    x0_extra = rng.uniform(np.log(0.05), np.log(3.0),
                           size=(N_RESTARTS - 1, NDIM + 1))
    return x, y, mc, x0_extra


def run_baseline_cpu():
    """Reference-pattern cycle on CPU.

    Returns (total_seconds_per_cycle, fit_seconds_per_cycle) — the fit time
    is split out so an idealized k-rank MPI baseline can be derived."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import bobe_tpu  # noqa: F401  (x64 + cache)
    from bobe_tpu.models import gp as gpm
    from bobe_tpu.ops import chol as chol_ops
    from bobe_tpu.ops import kernels as kr
    from bobe_tpu.ops import optimize as opt_ops

    x, y, mc, x0_extra = _make_data()
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    bounds = gp.hyperparam_bounds
    x0 = np.vstack([np.log(np.asarray(gp.get_hyperparams()))[None, :], x0_extra])

    mc_j = jnp.asarray(mc)

    fit_time = [0.0]

    def reference_style_cycle():
        # serial scipy refit (multi-restart loop on host). The reference
        # would farm these restarts over MPI ranks (pool.py:269-271); the
        # fit time is recorded separately so an idealized k-rank baseline
        # (fit/k + sweep, perfect scaling) can be derived for disclosure.
        t_fit = time.time()
        best, best_f = opt_ops.minimize_scipy_restarts(
            lambda lp: gpm.neg_mll(gp.state, gp.cfg, lp), x0,
            bounds=bounds, maxiter=MAXITER)
        fit_time[0] = time.time() - t_fit
        state = gpm.set_hyperparams(gp.state, gp.cfg, best)
        # per-candidate acquisition sweep (rank-1 chol + big tri-solve each)
        ls, amp = jnp.exp(state.log_ls), jnp.exp(state.log_amp)
        n = int(state.n)
        L = state.chol[:n, :n]
        X = state.x[:n]
        K_train_mc = kr.cross_kernel(gp.cfg.kernel, X, mc_j, ls, amp)

        def per_candidate(c):
            kc = kr.cross_kernel(gp.cfg.kernel, X, c[None, :], ls, amp)[:, 0]
            Lp = chol_ops.rank1_extend(L, kc, amp + gp.cfg.noise)
            k_new = kr.cross_kernel(gp.cfg.kernel, c[None, :], mc_j, ls, amp)
            k12 = jnp.vstack([K_train_mc, k_new])
            vv = chol_ops.tri_solve(Lp, k12)
            var = (amp + gp.cfg.noise) - jnp.sum(vv * vv, axis=0)
            return jnp.mean(jnp.sqrt(jnp.maximum(var, 1e-12)))

        acq = jax.lax.map(per_candidate, mc_j)
        return float(jnp.min(acq))

    # warm up compiles, then time. The denominator is the baseline's BEST of
    # 2 cycles: under host contention both sides inflate, and taking the
    # baseline's fastest (vs our median) keeps the reported ratio
    # conservative rather than contention-flattered.
    reference_style_cycle()
    totals, fits = [], []
    for _ in range(2):
        t0 = time.time()
        reference_style_cycle()
        totals.append(time.time() - t0)
        fits.append(fit_time[0])
    i = int(np.argmin(totals))
    return totals[i], fits[i]


def run_tpu_cycle() -> float:
    """TPU-native cycle. Returns seconds per cycle.

    The fit runs through the PRODUCTION ``gp.fit`` entry point — including
    the default-on exact-f64 endpoint selection and the host-routed f64
    state refresh that the dtype policy applies at this capacity — not a
    bare ``_fit_core`` descent. Measuring a cheaper pipeline than the one
    production ships would overstate the speedup.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bobe_tpu  # noqa: F401
    from bobe_tpu.acquisition import _wip_sweep_core
    from bobe_tpu.models import gp as gpm

    x, y, mc, x0_extra = _make_data()
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    x0 = jnp.asarray(np.vstack(
        [np.log(np.asarray(gp.get_hyperparams()))[None, :], x0_extra]))
    mc_j = jnp.asarray(mc)

    sweep = _wip_sweep_core(gp.cfg, True, "float64")
    host_xy = gp._host_mirror()

    def cycle():
        state, _info = gpm.fit(gp.state, gp.cfg, x0=x0, maxiter=MAXITER,
                               host_xy=host_xy)
        acq, V, var = sweep(state, mc_j)
        return float(jnp.min(acq))

    cycle()  # compile
    t0 = time.time()
    cycle()
    dt = time.time() - t0
    # Contention discipline (VERDICT r4): the official artifact is a single
    # driver capture, and round 4 showed a 1-core-saturated host inflating
    # it ~1.5x. Take >=5 independent batch timings (each batch sized to
    # ~0.5 s so per-batch noise averages) and report the MEDIAN per-cycle
    # time, with the min disclosed alongside so a contended capture is
    # self-diagnosing.
    reps = max(1, int(0.5 / max(dt, 1e-3)))
    samples = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(reps):
            cycle()
        samples.append((time.time() - t0) / reps)
    samples.sort()
    return samples[len(samples) // 2], samples[0]


def run_sampler_phase():
    """Steady-state sampler-phase timings at N=1024, d=8.

    The cycle metric above no longer measures the phase that dominates real
    cosmology runs (NS was 650 s of a 1,433 s planck-like wall in round 3),
    so the driver would be blind to regressions where they now matter. This
    times, at the SAME GP capacity as the cycle benchmark:
      * one convergence-mode nested-sampling run (the per-checkpoint cost in
        the BO loop; reference samplers.py:119-125 'convergence' settings),
      * one warm ensemble-HMC pool refresh (the per-iteration cost).
    Both are steady-state (compile + one warm pass excluded).
    """
    import jax.numpy as jnp

    import bobe_tpu  # noqa: F401
    from bobe_tpu.models import gp as gpm
    from bobe_tpu.samplers import nested_sampling, sample_gp_ensemble

    x, y, _mc, _x0 = _make_data()
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    gp.fit(n_restarts=2, maxiter=20)

    # NS: first call compiles the mega-graph (cached per host); the
    # steady-state number the BO loop pays at every convergence checkpoint
    # is then the MEDIAN of 3 runs (min disclosed) — the r04 artifact
    # recorded a single contended run at 14x the quiet number, so one
    # sample is not a measurement (VERDICT r4, What's weak #1)
    nested_sampling(gp, mode="convergence")
    ns_samples = []
    logz_dict, ok = None, False
    for _ in range(3):
        t0 = time.time()
        _, logz_dict, ok = nested_sampling(gp, mode="convergence")
        ns_samples.append(time.time() - t0)
    ns_samples.sort()

    # EHMC: cold call adapts the kernel; the FIRST warm call compiles the
    # fixed-mass variant (a different graph) — subsequent warm calls are
    # the steady-state refresh the BO loop pays every iteration
    out = sample_gp_ensemble(gp)
    out = sample_gp_ensemble(gp, warm_state=out["warm_state"])
    ehmc_samples = []
    for _ in range(3):
        t0 = time.time()
        out = sample_gp_ensemble(gp, warm_state=out["warm_state"])
        ehmc_samples.append(time.time() - t0)
    ehmc_samples.sort()
    return (ns_samples[1], ns_samples[0], ehmc_samples[1], ehmc_samples[0],
            float(logz_dict["mean"]), bool(ok))


def _probe_default_backend(timeout_s: float = 240.0) -> bool:
    """Initialize the default jax backend in a SUBPROCESS with a timeout.

    On tunnel-attached TPU setups a dead relay makes backend initialization
    block forever; probing in-process would hang this benchmark (and the
    driver around it) indefinitely. A subprocess probe converts that into a
    clean, diagnosable failure.
    """
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BACKEND_OK', jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return "BACKEND_OK" in out.stdout
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def main():
    if "--baseline-only" in sys.argv:
        dt, fit_s = run_baseline_cpu()
        # idealized 4-rank MPI reference (restart farm scales perfectly,
        # acquisition stays on rank 0 as in reference acquisition.py:394)
        rank4 = fit_s / 4.0 + (dt - fit_s)
        print(json.dumps({"baseline_cycle_s": dt, "baseline_fit_s": fit_s,
                          "baseline_cycle_4rank_s": rank4}))
        return

    skip_sampler = "--no-sampler-phase" in sys.argv

    on_accelerator = _probe_default_backend()
    if not on_accelerator:
        # The intended device is unreachable (dead tunnel). Rather than
        # hang or report nothing, measure OUR cycle on the host CPU and say
        # so in the metric label: against the same-machine CPU baseline this
        # is still an apples-to-apples ARCHITECTURE comparison (vmapped
        # restarts + fused sweep vs serial scipy + per-candidate updates),
        # just without the accelerator.
        print("bench.py: accelerator backend failed to initialize within "
              "the probe timeout (tunnel down?) — falling back to a "
              "CPU-vs-CPU architecture measurement.", file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")

    ours, ours_min = run_tpu_cycle()

    sampler = None
    if not skip_sampler:
        # the dominant phase of real cosmology-scale runs (VERDICT round 3):
        # measured every bench run so regressions are visible to the driver
        try:
            ns_s, ns_min, ehmc_s, ehmc_min, ns_logz, ns_ok = \
                run_sampler_phase()
            sampler = {"ns_convergence_s": round(ns_s, 4),
                       "ns_convergence_min_s": round(ns_min, 4),
                       "ehmc_refresh_s": round(ehmc_s, 4),
                       "ehmc_refresh_min_s": round(ehmc_min, 4),
                       "ns_logz": round(ns_logz, 4), "ns_success": ns_ok}
        except Exception as e:
            print(f"bench.py: sampler-phase measurement failed: {e!r}",
                  file=sys.stderr)

    # The CPU baseline is ALWAYS re-measured, in a subprocess on this
    # machine's CPU: a cached denominator goes stale even under a matching
    # host fingerprint (measured in round 3: a physical-node swap behind a
    # byte-identical /proc/cpuinfo slowed the same host_fp's CPU by 34%,
    # 10.68 s -> 14.30 s per baseline cycle, silently inflating the cached
    # ratio). BASELINE_CYCLE.json is kept as a *record* of the last
    # measurement, and BOBE_BENCH_BASELINE_S still overrides for tests.
    from bobe_tpu.config import _host_fingerprint

    host_fp = _host_fingerprint()
    baseline = baseline_4rank = None
    cache_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_CYCLE.json")
    cached = os.environ.get("BOBE_BENCH_BASELINE_S")
    if cached:
        baseline = float(cached)
    if baseline is None:
        try:
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--baseline-only"],
                capture_output=True, text=True, timeout=3000, env=env)
            blob = None
            for line in out.stdout.strip().splitlines()[::-1]:
                try:
                    blob = json.loads(line)
                    baseline = float(blob["baseline_cycle_s"])
                    baseline_4rank = blob.get("baseline_cycle_4rank_s")
                    break
                except Exception:
                    continue
            if baseline is not None:
                with open(cache_file, "w") as f:
                    json.dump({**blob, "host_fp": host_fp,
                               "note": "RECORD of the most recent reference-"
                                       "pattern cycle measured on this "
                                       "machine's CPU (see docstring); the "
                                       "benchmark re-measures every run — "
                                       "cached denominators go stale under "
                                       "physical-node drift"}, f)
        except Exception:
            baseline = None

    vs = (baseline / ours) if baseline else None
    metric = f"GP refit + WIP acquisition cycle @ N={N_TRAIN}, d={NDIM}"
    if not on_accelerator:
        # label the degraded mode AND the last real accelerator measurement
        # so the record stays interpretable: the vmapped-lockstep fit is a
        # deliberate TPU trade (batched MXU restarts) and is CPU-hostile.
        # cite the absolute TPU number only: the speedup denominator is
        # per-host (re-measured above), so a ratio recorded on a different
        # host would be wrong here
        metric += (" [CPU fallback: accelerator tunnel down; last real-TPU "
                   "measurement 0.3904 s/cycle on a v5e via relay, "
                   "BENCH_NOTES round 3]")
    # host-load annotation: the r04 artifact halved its own headline under
    # ambient 1-core contention with nothing in the record saying so. A
    # loadavg near (or above) ncpu tells the reader the median/min spread
    # is contention, not regression.
    try:
        load1, load5, _ = os.getloadavg()
        load = {"loadavg_1m": round(load1, 2), "loadavg_5m": round(load5, 2),
                "ncpu": os.cpu_count()}
    except OSError:
        load = None
    out = {
        "metric": metric,
        "value": round(ours, 4),
        "value_min": round(ours_min, 4),
        "unit": "s/cycle",
        "vs_baseline": None if vs is None else round(vs, 2),
    }
    if load is not None:
        out["host_load"] = load
    if baseline_4rank:
        # margin against the idealized 4-rank MPI reference (restart farm
        # scaled perfectly): the honest multi-process denominator
        out["vs_baseline_4rank"] = round(float(baseline_4rank) / ours, 2)
    if sampler is not None:
        out["sampler_phase"] = sampler
    print(json.dumps(out))


if __name__ == "__main__":
    main()
