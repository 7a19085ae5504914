"""Pallas TPU kernel: fused masked Gram matrix build.

Computes, one (128, 128) VMEM-resident tile per grid step:

    K[i, j] = mask_i mask_j * amp * corr(|x_i/ls - x_j/ls|^2)
              + (noise mask_i + (1 - mask_i)) * [i == j]

i.e. the scaled-distance matmul, the kernel nonlinearity, the activity
masking and the noise/identity diagonal of ops/kernels.gram_masked fused into
one pass — the XLA version materializes the squared-distance matrix through
HBM between the matmul and the exp.

Status: measurement-driven optional path. At cap<=1024 the GP fit is
latency-bound (XLA's chol runs in ~0.03 ms; one MLL evaluation is ~5 ms of
pipeline latency), so this kernel does not move the headline bench; it
matters at cap >= 4096 where the O(cap^2 d) distance build becomes
bandwidth-bound. float32 only (Pallas TPU has no f64).

Correctness is pinned against ops/kernels.gram_masked in tests/test_pallas.py
(interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
SQRT5 = math.sqrt(5.0)


def _gram_kernel(kernel_name, xa_ref, xb_ref, ma_ref, mb_ref, amp_ref,
                 noise_ref, out_ref):
    """One (TILE, TILE) output tile; inputs are the matching row/col tiles."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    xa = xa_ref[...]            # (TILE, d) row tile, pre-scaled by 1/ls
    xb = xb_ref[...]            # (TILE, d) col tile
    ma = ma_ref[...][0]         # (TILE,)
    mb = mb_ref[...][0]

    a2 = jnp.sum(xa * xa, axis=1)[:, None]
    b2 = jnp.sum(xb * xb, axis=1)[None, :]
    ab = jnp.dot(xa, xb.T, preferred_element_type=jnp.float32)
    dsq = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)

    if kernel_name == "rbf":
        corr = jnp.exp(-0.5 * dsq)
    else:  # matern-5/2
        d = jnp.sqrt(jnp.maximum(dsq, 1e-30))
        corr = (1.0 + SQRT5 * d + (5.0 / 3.0) * dsq) * jnp.exp(-SQRT5 * d)

    amp = amp_ref[0, 0]
    noise = noise_ref[0, 0]
    k = amp * corr * (ma[:, None] * mb[None, :])

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    eye = jnp.where((rows == cols) & (i == j), 1.0, 0.0).astype(k.dtype)
    out_ref[...] = k + (noise * ma + (1.0 - ma))[:, None] * eye


@functools.partial(jax.jit, static_argnames=("kernel_name", "interpret"))
def gram_masked_pallas(kernel_name, x, mask, lengthscales, kernel_variance,
                       noise, interpret: bool = False):
    """Drop-in f32 replacement for ops/kernels.gram_masked on TPU.

    x: (cap, d) with cap a multiple of 128. Returns (cap, cap) float32.
    """
    cap, d = x.shape
    assert cap % TILE == 0, f"cap must be a multiple of {TILE}"
    xs = (x / lengthscales).astype(jnp.float32)
    mask2d = mask.astype(jnp.float32).reshape(1, cap)
    amp = jnp.full((1, 1), kernel_variance, dtype=jnp.float32)
    nz = jnp.full((1, 1), noise, dtype=jnp.float32)

    grid = (cap // TILE, cap // TILE)
    kern = functools.partial(_gram_kernel, kernel_name)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((cap, cap), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),   # row tile of xs
            pl.BlockSpec((TILE, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),   # col tile of xs
            pl.BlockSpec((1, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),   # row mask
            pl.BlockSpec((1, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),   # col mask
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),   # amp
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),   # noise
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs, xs, mask2d, mask2d, amp, nz)
