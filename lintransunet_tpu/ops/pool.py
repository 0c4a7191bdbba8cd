"""Pooling via XLA reduce_window (replaces F.max_pool3d / nn.AvgPool2d).

Used for the deep-supervision label pyramid (utils/utils_3D_embed_full.py:64,74-76)
and PyramidLoss downsampling (loss/criterions.py:545-546).
"""

from typing import Sequence, Union

import jax
import jax.numpy as jnp

_IntOr3 = Union[int, Sequence[int]]


def _triple(v: _IntOr3) -> tuple:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(v)


def max_pool3d(x: jnp.ndarray, kernel_size: _IntOr3, stride: _IntOr3 = None) -> jnp.ndarray:
    """Max pool over the spatial dims of (N, H, W, D, C). No padding (torch default)."""
    k = _triple(kernel_size)
    s = _triple(stride if stride is not None else kernel_size)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1,) + k + (1,),
        window_strides=(1,) + s + (1,),
        padding="VALID",
    )


def avg_pool2d(x: jnp.ndarray, kernel_size: int, stride: int, padding: int) -> jnp.ndarray:
    """Average pool over the last-two-but-channel dims of (N, H, W, C).

    Matches ``nn.AvgPool2d(kernel, stride, padding)`` with
    count_include_pad=True (the torch default used by PyramidLoss).
    """
    k = (kernel_size, kernel_size)
    s = (stride, stride)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = jax.lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        jax.lax.add,
        window_dimensions=(1,) + k + (1,),
        window_strides=(1,) + s + (1,),
        padding=pads,
    )
    return summed / (kernel_size * kernel_size)
