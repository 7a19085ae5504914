"""Trace-then-decide probe for a fused Pallas NS proposal step (VERDICT r4 #6).

Question: at d >= 10 the convergence-mode NS inner step is believed
latency-bound (nested.py segmenting notes) — would one Pallas kernel fusing
cross-gram + matvec + threshold-gate cut the while_loop's per-iteration
latency, or is the loop already compute/structure-bound where a fusion can't
help?

Three measurements on the real chip, same GP capacity/d as production:

1. steady-state convergence NS wall (median of 3) and its call ledger
   (n_calls, n_iter) — the thing we'd be optimizing;
2. a pure GP-eval dependency chain: lax.scan of `depth` sequential
   (K*spec, d) mean evaluations (each step's input depends on the previous
   output, so steps cannot overlap) with depth/shape matched to the NS run's
   own ledger — this is the floor any proposal-step rewrite could reach
   WITHOUT changing the math (it still evaluates the same points);
3. the same chain at half the capacity — if the chain time scales ~ linearly
   with cap the steps are compute-bound (MXU work), if ~flat they are
   op-latency-bound (fusion/Pallas territory).

Decision rule (recorded in BENCH_NOTES):
  * bookkeeping share = 1 - chain/NS: the fraction of NS wall that is NOT
    the GP eval chain (slice bookkeeping, gather/scatter, RNG, kill logic).
    A Pallas proposal fusion can only attack the eval-chain part; if the
    bookkeeping share dominates, the fusion is rejected and the lever is
    loop structure (fewer sequential repeats), not kernels.
  * if the chain dominates AND is latency-bound (flat in cap), a fused
    kernel is worth prototyping.

Also attempts a jax.profiler trace capture around one NS run; on relay
transports device timelines may not be available — the probe records
whether the capture produced device data.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(d: int = 15, cap: int = 1024):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bobe_tpu  # noqa: F401
    from bobe_tpu.models import gp as gpm
    from bobe_tpu.samplers import nested_sampling

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(cap, d))
    y = -0.5 * np.sum(((x - 0.5) / 0.2) ** 2, axis=1)
    gp = gpm.GP(train_x=jnp.asarray(x), train_y=jnp.asarray(y), noise=1e-8)
    gp.fit(n_restarts=2, maxiter=30)

    # 1. steady-state NS (median of 3 after warm)
    _, logz, ok = nested_sampling(gp, mode="convergence",
                                  rng=np.random.default_rng(1),
                                  rng_key=jax.random.PRNGKey(1))
    walls, ledgers = [], []
    for i in range(3):
        t0 = time.time()
        samples, logz, ok = nested_sampling(gp, mode="convergence",
                                            rng=np.random.default_rng(2 + i),
                                            rng_key=jax.random.PRNGKey(2 + i))
        walls.append(time.time() - t0)
        raw = samples.get("raw")
        ledgers.append(len(raw[1]) if raw is not None else 0)
    walls.sort()
    ns_wall = walls[1]

    # infer the NS loop's eval-chain geometry from production rules
    # (samplers.get_ns_settings / nested.run_nested): K kills per iteration,
    # each with n_repeats sequential slice repeats, each repeat ~1 batched
    # (K*spec,) GP eval in the speculative path
    n_dead = ledgers[1] if len(ledgers) > 1 else ledgers[0]
    nlive = max(500, 40 * d)
    K = max(1, int(round(nlive * 0.10)))  # kill_frac default 0.10
    n_repeats = max(3, int(np.ceil(3.0 * d))) if d >= 10 else \
        max(3, int(np.ceil(1.5 * d)))
    spec = 4 if d >= 10 else 1
    n_iters = max(1, n_dead // K)
    depth = n_iters * n_repeats  # sequential GP-eval steps in the whole run
    batch_rows = K * spec

    # 2. matched pure eval chain: depth sequential (batch_rows, d) evals
    ls = jnp.exp(gp.state.log_ls)
    amp = jnp.exp(gp.state.log_amp)
    from bobe_tpu.ops import kernels as kr

    X, alpha, mask = gp.state.x, gp.state.alpha, gp.state.mask()

    def eval_mean(pts):
        k12 = kr.cross_kernel(gp.cfg.kernel, X, pts, ls, amp)
        k12 = k12 * mask[:, None]
        return k12.T @ alpha

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def chain(pts0, steps):
        def body(carry, _):
            mu = eval_mean(carry)
            # next points depend on mu -> true sequential dependency
            nxt = jnp.clip(carry + 1e-6 * mu[:, None], 0.0, 1.0)
            return nxt, mu[0]
        out, _ = lax.scan(body, pts0, None, length=steps)
        return jnp.sum(out)

    pts0 = jnp.asarray(rng.uniform(size=(batch_rows, d)))
    steps = int(depth)
    float(chain(pts0, steps))  # compile + warm (steps static via argnums)
    t0 = time.time()
    float(chain(pts0, steps))
    chain_wall = time.time() - t0

    # 3. half-capacity chain (compute- vs latency-bound discriminator)
    gp2 = gpm.GP(train_x=jnp.asarray(x[: cap // 2]),
                 train_y=jnp.asarray(y[: cap // 2]), noise=1e-8)
    X2, alpha2, mask2 = gp2.state.x, gp2.state.alpha, gp2.state.mask()
    ls2, amp2 = jnp.exp(gp2.state.log_ls), jnp.exp(gp2.state.log_amp)

    @partial(jax.jit, static_argnums=1)
    def chain2(pts0, steps):
        def body(carry, _):
            k12 = kr.cross_kernel(gp2.cfg.kernel, X2, carry, ls2, amp2)
            mu = (k12 * mask2[:, None]).T @ alpha2
            return jnp.clip(carry + 1e-6 * mu[:, None], 0.0, 1.0), mu[0]
        out, _ = lax.scan(body, pts0, None, length=steps)
        return jnp.sum(out)

    float(chain2(pts0, steps))
    t0 = time.time()
    float(chain2(pts0, steps))
    chain_half_wall = time.time() - t0

    # profiler capture (best-effort on relay transports)
    trace_dir = "/tmp/ns_trace"
    trace_ok = False
    try:
        with jax.profiler.trace(trace_dir):
            nested_sampling(gp, mode="convergence",
                            rng=np.random.default_rng(9),
                            rng_key=jax.random.PRNGKey(9))
        for root, _, files in os.walk(trace_dir):
            if any(f.endswith((".pb", ".json.gz", ".xplane.pb"))
                   for f in files):
                trace_ok = True
    except Exception as e:
        print(f"profiler capture failed: {e!r}", file=sys.stderr)

    out = {
        "d": d, "cap": cap, "ns_wall_s": round(ns_wall, 3),
        "ns_walls": [round(w, 3) for w in walls],
        "n_dead": int(n_dead), "est_iters": n_iters,
        "chain_depth": steps, "batch_rows": batch_rows,
        "chain_wall_s": round(chain_wall, 3),
        "chain_half_cap_wall_s": round(chain_half_wall, 3),
        "eval_chain_share": round(chain_wall / ns_wall, 3),
        "cap_scaling": round(chain_wall / max(chain_half_wall, 1e-9), 2),
        "trace_captured": trace_ok, "trace_dir": trace_dir,
        "logz_ok": bool(ok),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        kw[k] = int(v)
    main(**kw)
