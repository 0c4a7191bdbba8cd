"""3D convolution + InstanceNorm + LeakyReLU primitives, channels-last.

These replace the cuDNN conv blocks of the reference (Unet_3Dblock.py:
310-316, 523-529 and friends). Convs lower to XLA conv_general_dilated with
``(N, H, W, D, C) x (kh, kw, kd, I, O)`` layouts, which XLA tiles straight
onto the MXU; the norm + activation epilogues fuse into the conv output.

InstanceNorm matches ``nn.InstanceNorm3d`` defaults: affine=False,
eps=1e-5, biased variance, stats per (sample, channel) over spatial dims —
always accumulated in float32 regardless of compute dtype.
"""

from functools import partial
from typing import Sequence, Tuple, Union

import os

import jax
import jax.numpy as jnp

_DIMNUMS = ("NHWDC", "HWDIO", "NHWDC")

_IntOr3 = Union[int, Sequence[int]]


def _triple(v: _IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(v)  # type: ignore[return-value]


def conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray = None,
    stride: _IntOr3 = 1,
    padding: _IntOr3 = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """Channels-last 3D conv with symmetric explicit padding (torch semantics).

    ``padding=k//2`` with odd k reproduces torch ``padding='same'`` exactly,
    including strided cases (torch pads symmetrically; XLA SAME does not,
    so explicit padding is used everywhere).
    """
    s = _triple(stride)
    p = _triple(padding)
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# How IN statistics are computed (trace-time; see ops/packed_conv.py for
# the measurement history): "reduce" fuses the stat reductions into the
# producing fusion; "unfused" forces them out via an optimization_barrier
# (a standalone sum/sumsq reduce streams at 1.2-2x the bandwidth floor,
# while the embedded multi-output (stats, y) producer fusions run ~5x over
# floor — experiments/in_stats_probe.py, round-4 trace); "dot" uses MXU
# contractions (packed_conv._mxu_group_stats).
IN_STATS = os.environ.get("LINTRANSUNET_IN_STATS", "reduce")


def _stats_input(x: jnp.ndarray) -> jnp.ndarray:
    """The tensor IN statistics are computed from (see IN_STATS above)."""
    if IN_STATS == "unfused":
        return jax.lax.optimization_barrier(x)
    return x


# How the normalise APPLY is computed (trace-time). Stats (mean/rstd) are
# always f32; "f32" applies (x32 - mean) * rstd in f32 then casts back
# (the round-1..4 default), "affine" folds them into per-channel
# scale/shift = (rstd, -mean*rstd) cast to the TENSOR dtype and applies
# one bf16 FMA — no full-tensor f32 intermediate. The [128]/[64]-stat
# consumer fusions measured ~5x over their read+write floor on the
# round-4 trace; the f32 elementwise chain is the suspect.
NORM_APPLY = os.environ.get("LINTRANSUNET_NORM_APPLY", "f32")


def apply_norm(x: jnp.ndarray, mean: jnp.ndarray, rstd: jnp.ndarray,
               x32=None) -> jnp.ndarray:
    """Normalise ``x`` with broadcast-ready f32 ``mean``/``rstd``.

    ``x32`` optionally passes a precomputed f32 view of x (reused from the
    stats pass in the f32 mode; ignored in affine mode)."""
    if NORM_APPLY == "affine":
        scale = rstd.astype(x.dtype)
        shift = (-mean * rstd).astype(x.dtype)
        return x * scale + shift
    if x32 is None:
        x32 = x.astype(jnp.float32)
    return ((x32 - mean) * rstd).astype(x.dtype)


def moment_stats(x32: jnp.ndarray, axes, eps: float):
    """Single-pass (mean, rsqrt(var+eps)) over ``axes``.

    E[x^2] - E[x]^2 instead of E[(x-mean)^2]: the two-pass form makes the
    second reduction DEPEND on the first, forcing two full HBM reads of the
    tensor; the sibling reductions here fuse into one pass (~25 ms/window
    of IN stat fusions on the eval trace, docs/DESIGN.md round-3 ledger).
    Cancellation is benign at these scales: activations are O(1) post-norm
    and stats accumulate in f32 tree reductions.
    """
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    meansq = jnp.mean(jnp.square(x32), axis=axes, keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(N, C) normalisation over spatial dims of (N, ..., C), affine-free."""
    axes = tuple(range(1, x.ndim - 1))
    x32 = _stats_input(x).astype(jnp.float32)
    mean, rstd = moment_stats(x32, axes, eps)
    return apply_norm(x, mean, rstd, x32=x32)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    """torch nn.LeakyReLU default slope."""
    return jnp.where(x >= 0, x, x * jnp.asarray(negative_slope, x.dtype))
