"""Pallas TPU kernel: fused masked Gram matrix build.

Computes in ONE kernel launch:

    K[i, j] = mask_i mask_j * amp * corr(|x_i/ls - x_j/ls|^2)
              + (noise mask_i + (1 - mask_i)) * [i == j]

i.e. the scaled-distance matmul, the kernel nonlinearity, the activity
masking and the noise/identity diagonal of ops/kernels.gram_masked fused into
one VMEM-resident pass — the XLA version materializes the squared-distance
matrix through HBM between the matmul and the exp and lowers to several
kernels.

TPU-compilation notes (each learned from a real Mosaic crash on this
remote-compile toolchain; the CPU interpret path accepted all broken
variants):
  * only identity-style block index maps legalize — (i, 0) row-tile maps,
    (1, TILE) vector blocks and (1, 1) SMEM scalars all fail ("failed to
    legalize func.return" / layout bitwidth checks). The kernel is therefore
    GRID-FREE: full arrays as single VMEM blocks, which caps it at
    cap <= 1024 (4 MB output + operands well inside the ~16 MB VMEM);
  * coordinates are zero-padded to 128 lanes ((cap, d) blocks with d < 128
    fail layout legalization); zero columns add nothing to distances;
  * mask/amp/noise travel in one (cap, 128) aux array (mask lane 0, amp
    replicated lane 1, noise lane 2) consumed as column-vector broadcasts —
    no scalar loads;
  * constants must be explicit float32: with jax_enable_x64 a bare Python
    float promotes a branch to f64 and Mosaic checks bitwidth <= 32.

float32 only (Pallas TPU has no f64). Correctness is pinned against
ops/kernels.gram_masked in tests/test_pallas.py (interpret mode on CPU,
compiled on TPU).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
MAX_GRIDFREE_CAP = 1024  # 4 MB f32 output; stays well inside VMEM
SQRT5 = math.sqrt(5.0)
F32 = jnp.float32


def _gram_kernel(kernel_name, x_ref, aux_ref, out_ref):
    """Whole padded Gram in one step; x (cap, 128) pre-scaled by 1/ls."""
    x = x_ref[...]
    aux = aux_ref[...]          # (cap, 128): lane0 mask, lane1 amp, lane2 noise
    m = aux[:, 0]
    amp_col = aux[:, 1]
    noise_col = aux[:, 2]

    a2 = jnp.sum(x * x, axis=1)
    ab = jnp.dot(x, x.T, preferred_element_type=F32)
    dsq = jnp.maximum(a2[:, None] + a2[None, :] - F32(2.0) * ab, F32(0.0))

    if kernel_name == "rbf":
        corr = jnp.exp(F32(-0.5) * dsq)
    else:  # matern-5/2
        d = jnp.sqrt(jnp.maximum(dsq, F32(1e-30)))
        corr = (F32(1.0) + F32(SQRT5) * d + F32(5.0 / 3.0) * dsq) \
            * jnp.exp(F32(-SQRT5) * d)

    k = corr * (m[:, None] * m[None, :]) * amp_col[:, None]

    cap = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
    eye = (rows == cols).astype(F32)
    out_ref[...] = k + (noise_col * m + (F32(1.0) - m))[:, None] * eye


@functools.partial(jax.jit, static_argnames=("kernel_name", "interpret"))
def gram_masked_pallas(kernel_name, x, mask, lengthscales, kernel_variance,
                       noise, interpret: bool = False):
    """Drop-in f32 replacement for ops/kernels.gram_masked on TPU.

    x: (cap, d) with cap a multiple of 128, cap <= MAX_GRIDFREE_CAP, d <= 128.
    Returns (cap, cap) float32.
    """
    cap, d = x.shape
    assert cap % TILE == 0, f"cap must be a multiple of {TILE}"
    assert cap <= MAX_GRIDFREE_CAP, (
        f"cap={cap} exceeds the grid-free VMEM budget ({MAX_GRIDFREE_CAP}); "
        "use ops/kernels.gram_masked")
    assert d <= TILE, f"d must be <= {TILE}"
    xs = (x / lengthscales).astype(F32)
    xs = jnp.pad(xs, ((0, 0), (0, TILE - d)))
    aux = jnp.zeros((cap, TILE), dtype=F32)
    aux = aux.at[:, 0].set(mask.astype(F32))
    aux = aux.at[:, 1].set(jnp.asarray(kernel_variance, F32))
    aux = aux.at[:, 2].set(jnp.asarray(noise, F32))

    kern = functools.partial(_gram_kernel, kernel_name)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((cap, cap), F32),
        interpret=interpret,
    )(xs, aux)
