"""Device-mesh helpers: sharded GP prediction, acquisition sweeps and
sampler chains over a jax.sharding.Mesh.

This is the TPU-native replacement for the reference's device-level
parallelism, which was jax.pmap over (usually faked) host devices for NUTS
chains (/root/reference/BOBE/samplers.py:304-349) and nothing else. Here a
1-D mesh over all available devices carries:

* batch-sharded GP prediction / WIP sweeps (query points split over the mesh;
  the GP state is replicated; XLA/GSPMD inserts the all-gathers), and
* chain-sharded NUTS (the vmapped chain axis is laid out over devices).

On a single chip everything degrades to the unsharded jitted path.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gp as gpm
from ..utils.log import get_logger

log = get_logger("mesh")

AXIS = "dev"


def get_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'dev'."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


_PRODUCTION_MESH = None


def production_mesh() -> Optional[Mesh]:
    """The mesh the production BO loop shards over, or None on a single chip.

    This is how multi-chip turns ON for the whole framework: the acquisition
    sweep cores, the ensemble/NUTS chain axes and the NS batch evaluations
    all consult this and add sharding constraints when it is non-None (the
    reference's only device-level dispatch was pmapping NUTS chains,
    /root/reference/BOBE/samplers.py:304-349). Disable with BOBE_TPU_NO_MESH=1
    (used by the sharded-vs-unsharded parity tests).

    Under a multi-process ``jax.distributed`` group (the DistributedPool
    deployment: rank 0 orchestrates, other ranks sit in worker_loop serving
    likelihoods) the mesh covers only THIS process's addressable devices.
    Building it from the global ``jax.devices()`` list would have rank 0
    dispatch single-controller computations onto devices owned by processes
    that are not executing the same program — a multi-controller violation
    that hangs the runtime. Each rank's device math is local; the hosts
    cooperate only through the pool's host-side collectives. (The reference's
    mpi4py ranks likewise each drove only their own jax platform,
    /root/reference/BOBE/pool.py:143-206.)
    """
    import os

    if os.environ.get("BOBE_TPU_NO_MESH"):
        return None
    global _PRODUCTION_MESH
    if _PRODUCTION_MESH is None:
        try:
            if jax.process_count() > 1:
                devices = jax.local_devices()
            else:
                devices = jax.devices()
        except RuntimeError:
            return None
        if len(devices) < 2:
            return None
        _PRODUCTION_MESH = get_mesh(devices)
    return _PRODUCTION_MESH


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))


def pad_to_multiple(x: jnp.ndarray, m: int):
    """Pad the leading axis to a multiple of m. Returns (padded, n_orig)."""
    n = x.shape[0]
    rem = (-n) % m
    if rem:
        pad = jnp.repeat(x[-1:], rem, axis=0)
        x = jnp.concatenate([x, pad], axis=0)
    return x, n


@lru_cache(maxsize=16)
def _sharded_predict_core(cfg: gpm.GPTrainConfig, mesh: Mesh):
    @jax.jit
    def run(state, xq):
        xq = jax.lax.with_sharding_constraint(xq, batch_sharded(mesh))
        return gpm.predict(state, cfg, xq)

    return run


def sharded_predict(gp, xq, mesh: Optional[Mesh] = None):
    """Physical-scale (mean, var) with the query batch sharded over the mesh."""
    mesh = mesh if mesh is not None else get_mesh()
    xq = jnp.atleast_2d(xq)
    xq_p, n = pad_to_multiple(xq, mesh.size)
    run = _sharded_predict_core(gp.cfg, mesh)
    mean, var = run(gp.state, xq_p)
    return mean[:n], var[:n]


@lru_cache(maxsize=16)
def _sharded_wip_core(cfg: gpm.GPTrainConfig, use_std: bool, mesh: Mesh,
                      n_valid: Optional[int] = None):
    from ..ops.fantasy import posterior_batch, wip_sweep

    @jax.jit
    def run(state, mc_points):
        ls, amp = jnp.exp(state.log_ls), jnp.exp(state.log_amp)
        # candidate/mc batch sharded over devices; state replicated; kernel
        # math in warp space (identity unless cfg.input_warp)
        mc_sh = jax.lax.with_sharding_constraint(mc_points, batch_sharded(mesh))
        mc_w = gpm.query_coords(state, cfg, mc_sh)
        V, var = posterior_batch(cfg.kernel, gpm.train_coords(state, cfg),
                                 state.mask(), state.chol,
                                 mc_w, ls, amp, cfg.noise)
        # n_valid: the integration mean must skip padded duplicate columns,
        # or every candidate's value is biased toward the repeated point
        return wip_sweep(cfg.kernel, mc_w, V, var, ls, amp, cfg.noise,
                         state.y_std, use_std, n_valid=n_valid)

    return run


def sharded_wip_sweep(gp, mc_points, use_std: bool, mesh: Optional[Mesh] = None):
    """WIP acquisition over the MC pool with the pool sharded over devices."""
    mesh = mesh if mesh is not None else get_mesh()
    mc_points = jnp.atleast_2d(mc_points)
    mc_p, n = pad_to_multiple(mc_points, mesh.size)
    run = _sharded_wip_core(gp.cfg, use_std, mesh,
                            n if mc_p.shape[0] != n else None)
    return run(gp.state, mc_p)[:n]


_SHARDED_NUTS_CACHE: dict = {}


def sharded_nuts(apply_fn, ctx, init_z, keys, mesh: Optional[Mesh] = None,
                 **chain_kwargs):
    """Run vmapped NUTS chains with the chain axis sharded over the mesh.

    init_z/keys: (n_chains, ...) with n_chains a multiple of mesh.size for an
    even layout (padding is the caller's choice).

    The jitted runner is cached on (apply_fn, chain kwargs): building a fresh
    ``jax.jit`` wrapper per call would miss jit's function-identity cache and
    retrace the NUTS program on every invocation.
    """
    from functools import partial

    from ..infer.nuts import run_chain

    mesh = mesh if mesh is not None else get_mesh()
    sh = batch_sharded(mesh)
    init_z = jax.device_put(init_z, sh)
    keys = jax.device_put(keys, sh)
    try:
        cache_key = (apply_fn, tuple(sorted(chain_kwargs.items())))
        hash(cache_key)
    except TypeError:  # unhashable kwarg (e.g. array): fall back to uncached
        cache_key = None
    runner = None if cache_key is None else _SHARDED_NUTS_CACHE.get(cache_key)
    if runner is None:
        runner = jax.jit(jax.vmap(partial(run_chain, apply_fn, **chain_kwargs),
                                  in_axes=(None, 0, 0)))
        if cache_key is not None:
            if len(_SHARDED_NUTS_CACHE) >= 16:
                _SHARDED_NUTS_CACHE.pop(next(iter(_SHARDED_NUTS_CACHE)))
            _SHARDED_NUTS_CACHE[cache_key] = runner
    return runner(ctx, init_z, keys)
