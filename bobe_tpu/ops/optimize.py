"""Bounded multi-restart minimization, fully on device.

The reference farms hyperparameter restarts over MPI ranks and runs scipy
L-BFGS-B per rank (/root/reference/BOBE/optim.py:249-358, pool.py:239-328).
Here every restart is a vmapped lane of a single jitted optimizer loop, so 8
restarts cost one batched Cholesky per iteration on the TPU instead of 8
processes — this replaces both ``optimize_scipy`` and the MPI restart farm.

Box constraints are enforced with a smooth sigmoid reparametrization
    x = lo + (hi - lo) * sigmoid(z),
which keeps the optimizer unconstrained (L-BFGS curvature stays valid, unlike
projection) while guaranteeing feasibility.

A host-side scipy L-BFGS-B path is kept as an optional exact-parity oracle.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..utils.log import get_logger

log = get_logger("optim")

_Z_CLIP = 16.0


def setup_bounds(bounds, num_params):
    """Normalize bounds to a (2, num_params) array (or None)."""
    if bounds is None:
        return None
    bounds = jnp.asarray(bounds, dtype=jnp.float64)
    if bounds.shape == (2,):
        bounds = jnp.tile(bounds[:, None], (1, num_params))
    elif bounds.shape != (2, num_params):
        raise ValueError(f"Bounds shape {bounds.shape} incompatible with {num_params} params")
    return bounds


def _to_z(x, bounds):
    u = (x - bounds[0]) / (bounds[1] - bounds[0])
    u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
    return jnp.clip(jnp.log(u) - jnp.log1p(-u), -_Z_CLIP, _Z_CLIP)


def _to_x(z, bounds):
    return bounds[0] + (bounds[1] - bounds[0]) * jax.nn.sigmoid(z)


def minimize_restarts(
    fun: Callable,
    x0: jnp.ndarray,
    bounds=None,
    method: str = "lbfgs",
    maxiter: int = 200,
    patience: int = 5,
    learning_rate: float = 1e-2,
    gtol: float = 1e-6,
    ftol: float = 1e-9,
    decrease_factor: float = 0.45,
    max_backtracking_steps: int = 3,
    linesearch_store_grad: bool = False,
    return_all: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize ``fun`` from each row of x0 (R, p); returns (best_x, best_f).

    With ``return_all=True``, returns every restart's endpoint instead:
    (x_all (R, p), f_all (R,)) — lets callers re-rank the endpoints under a
    different (e.g. higher-precision) objective than the one descended on.

    All restarts advance in lockstep inside one while_loop; a restart retires
    when its best value hasn't improved for ``patience`` steps. NaN
    evaluations retire the lane with its previous best retained (mirrors the
    reference's screening of failed restarts, optim.py:325-333).

    The function is pure/traceable: callers should wrap it (together with the
    construction of ``fun``'s captured state) in their own ``jax.jit`` so the
    whole fit compiles once per shape bucket.
    """
    x0 = jnp.atleast_2d(x0)
    R, p = x0.shape
    bounds_arr = setup_bounds(bounds, p)

    if bounds_arr is not None:
        z0 = jax.vmap(lambda x: _to_z(x, bounds_arr))(x0)
        # the z-clip lives INSIDE the objective (instead of clipping the
        # iterate post-update) so the line search's stored value/grad at the
        # accepted point stay exact and can be reused — saving one full
        # objective+gradient evaluation per L-BFGS iteration. Outside the
        # clip range the gradient is exactly zero, so saturated coordinates
        # simply stop moving (patience retires stuck lanes).
        obj = lambda z: fun(_to_x(jnp.clip(z, -_Z_CLIP, _Z_CLIP), bounds_arr))
    else:
        z0 = x0
        obj = fun

    if method == "lbfgs":
        # L-BFGS with BACKTRACKING line search. optax.lbfgs()'s default zoom
        # line search produces a traced graph that the TPU toolchain compiles
        # pathologically slowly (minutes-to-never at N=1024); backtracking
        # compiles in seconds and converges equivalently on GP MLL surfaces.
        # scale(-1) turns the lbfgs direction into a DESCENT update: the zoom
        # linesearch negates internally but the backtracking one does not
        # (without it every step is rejected and the optimizer stalls).
        # The search compiles to a FIXED-trip loop under vmap, so every
        # iteration pays max_backtracking_steps objective evaluations whether
        # accepted early or not — keep the cap small and shrink fast (3
        # trials at 0.45 cover the same step range per search as 4 at 0.5;
        # measured A/B on TPU, BENCH_NOTES.md; patience covers the rest).
        # store_grad=False keeps the trials VALUE-ONLY: with store_grad=True
        # the accepted-point gradient transpose sits under a lax.cond that
        # vmap lowers to select, so every trial pays a full backward pass
        # (~3x the forward) — value-only trials + one value_and_grad at the
        # accepted point is ~40% less work per iteration (measured on TPU).
        opt = optax.chain(
            optax.scale_by_lbfgs(),
            optax.scale(-1.0),
            optax.scale_by_backtracking_linesearch(
                max_backtracking_steps=max_backtracking_steps,
                decrease_factor=decrease_factor,
                store_grad=linesearch_store_grad),
        )
    elif method == "adam":
        opt = optax.adam(learning_rate)
    else:
        raise ValueError(f"Unknown device optimizer '{method}'")

    vg = jax.value_and_grad(obj)

    def single_init(z):
        v0, g0 = vg(z)
        state = opt.init(z)
        ok = jnp.isfinite(v0)
        best_v = jnp.where(ok, v0, jnp.inf)
        return dict(
            z=z, state=state, best_v=best_v, best_z=z, pat=jnp.asarray(patience),
            active=ok, val=v0, grad=g0,
        )

    def single_step(c):
        if method == "lbfgs":
            updates, new_state = opt.update(
                c["grad"], c["state"], c["z"], value=c["val"], grad=c["grad"], value_fn=obj
            )
        else:
            updates, new_state = opt.update(c["grad"], c["state"], c["z"])
        z_new = optax.apply_updates(c["z"], updates)
        if method == "lbfgs" and linesearch_store_grad:
            # the backtracking search (store_grad=True) already evaluated the
            # objective and gradient at the accepted z_new — reuse instead of
            # re-dispatching a Gram+Cholesky evaluation
            v_new = optax.tree_utils.tree_get(new_state, "value")
            g_new = optax.tree_utils.tree_get(new_state, "grad")
        else:
            v_new, g_new = vg(z_new)
        ok = jnp.isfinite(v_new)
        # scipy-style relative ftol: improvements below ftol*|f| don't reset
        # patience, so converged lanes retire instead of spinning to maxiter
        meaningful = ftol * (jnp.abs(c["best_v"]) + jnp.abs(v_new) + 1e-12)
        better = ok & (v_new < c["best_v"])
        improved = ok & (v_new < c["best_v"] - meaningful)
        best_v = jnp.where(better, v_new, c["best_v"])
        best_z = jnp.where(better, z_new, c["best_z"])
        pat = jnp.where(improved, patience, c["pat"] - 1)
        small_grad = jnp.linalg.norm(g_new) < gtol
        active_next = c["active"] & ok & (pat > 0) & ~small_grad
        # Freeze retired lanes so NaNs cannot propagate through their state.
        frozen = lambda old, new: jnp.where(c["active"], new, old)
        return dict(
            z=frozen(c["z"], z_new),
            state=jax.tree.map(frozen, c["state"], new_state),
            best_v=best_v,
            best_z=best_z,
            pat=pat,
            active=active_next,
            val=jnp.where(c["active"] & ok, v_new, c["val"]),
            grad=jnp.where(c["active"] & ok, g_new, c["grad"]),
        )

    v_init = jax.vmap(single_init)
    v_step = jax.vmap(single_step)

    carry0 = v_init(z0)

    def cond(c):
        it, carry = c
        return jnp.logical_and(it < maxiter, jnp.any(carry["active"]))

    def body(c):
        it, carry = c
        return it + 1, v_step(carry)

    _, carry = lax.while_loop(cond, body, (0, carry0))
    best_z, best_v = carry["best_z"], carry["best_v"]
    if return_all:
        # clip exactly as the objective did, so the returned x matches the
        # point whose value was actually evaluated
        z_all = jnp.clip(best_z, -_Z_CLIP, _Z_CLIP)
        x_all = (jax.vmap(lambda z: _to_x(z, bounds_arr))(z_all)
                 if bounds_arr is not None else best_z)
        return x_all, best_v
    i = jnp.argmin(best_v)
    z_star, f_star = best_z[i], best_v[i]
    # clip exactly as the bounded objective did (see return_all above): an
    # update can push z past the clip range, and the unclipped x would differ
    # from the point whose best_v was actually evaluated
    x_star = (_to_x(jnp.clip(z_star, -_Z_CLIP, _Z_CLIP), bounds_arr)
              if bounds_arr is not None else z_star)
    return x_star, f_star


def minimize_scipy_restarts(
    fun: Callable,
    x0,
    bounds=None,
    maxiter: int = 200,
    vg: Optional[Callable] = None,
    return_all: bool = False,
    **_unused,
):
    """Host-side scipy L-BFGS-B multi-restart (parity oracle; cf. reference
    optim.py:249). Gradients come from one jitted value_and_grad.

    ``vg``: optional prebuilt ``lp -> (value, grad)`` callable. The default
    jits ``fun`` per call — fine for one-off oracle use, but a caller invoking
    this every BO iteration (the host-routed f64 fit) must pass a cached
    jitted vg or pay a full retrace each fit.

    ``return_all``: additionally return the per-restart endpoints
    ``(all_x (R', p), all_f (R',))`` for the restarts that completed with a
    finite objective — the raw material for basin analysis (hyperparameter-
    uncertainty propagation into the evidence bounds, samplers.py)."""
    from scipy.optimize import minimize as sp_minimize

    x0 = np.atleast_2d(np.asarray(x0, dtype=np.float64))
    R, p = x0.shape
    bounds_arr = setup_bounds(bounds, p)
    scipy_bounds = (
        None
        if bounds_arr is None
        else [(float(bounds_arr[0, i]), float(bounds_arr[1, i])) for i in range(p)]
    )

    if vg is None:
        vg = jax.jit(jax.value_and_grad(fun))

    def f_np(x):
        v, g = vg(jnp.asarray(x))
        return float(v), np.asarray(g, dtype=np.float64)

    def one_restart(xi):
        return sp_minimize(
            f_np, xi, jac=True, method="L-BFGS-B", bounds=scipy_bounds,
            options={"maxiter": maxiter},
        )

    best_f, best_x = np.inf, None
    for xi in x0:
        v, _ = f_np(xi)
        if np.isfinite(v) and v < best_f:
            best_f, best_x = v, xi

    # restarts are independent: run them on a thread pool when the host has
    # cores to spare (scipy's L-BFGS-B fortran core and jax executions both
    # release the GIL). This is the host-side analogue of the reference's
    # MPI restart farm (pool.py:269-271); on a 1-core host it degrades to
    # the serial loop.
    workers = min(len(x0), os.cpu_count() or 1)
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            outcomes = list(ex.map(
                lambda xi: _try_restart(one_restart, xi), x0))
    else:
        outcomes = [_try_restart(one_restart, xi) for xi in x0]
    all_x, all_f = [], []
    for i, res in enumerate(outcomes):
        if res is None:
            log.warning(f"scipy restart {i} raised (skipped)")
            continue
        # any finite endpoint competes: res.fun is OUR objective evaluated at
        # res.x, so even an "ABNORMAL" line-search termination (scipy gives
        # up on further progress, commonly at the last ulp near an optimum)
        # returns a usable best-so-far point — discarding it threw away the
        # winning restart on GP MLL surfaces (measured: two -179.04 abnormal
        # endpoints discarded in favor of a +3935 nit-1 "converged" one)
        if np.isfinite(res.fun):
            all_x.append(np.asarray(res.x, dtype=np.float64))
            all_f.append(float(res.fun))
            if res.fun < best_f:
                best_f, best_x = float(res.fun), res.x
    if best_x is None:
        raise RuntimeError(
            "every optimizer restart failed (objective non-finite at all "
            "initial points and no scipy run succeeded)")
    if return_all:
        return (jnp.asarray(best_x), jnp.asarray(best_f),
                np.asarray(all_x), np.asarray(all_f))
    return jnp.asarray(best_x), jnp.asarray(best_f)


def _try_restart(runner, xi):
    """Run one scipy restart, mapping exceptions to None (skipped)."""
    try:
        return runner(xi)
    except Exception:  # pragma: no cover - defensive
        return None


def minimize(fun, x0, bounds=None, optimizer="lbfgs", **kw):
    """Dispatch: 'lbfgs'/'adam' run vmapped on device; 'scipy' on host."""
    if optimizer == "scipy":
        return minimize_scipy_restarts(fun, x0, bounds=bounds, **kw)
    return minimize_restarts(fun, x0, bounds=bounds, method=optimizer, **kw)
