"""Kernel/primitive layer: the compute-intensive ops, written TPU-first.

Everything here is a pure function over jnp arrays, jit/vmap/grad friendly,
static-shape, with no host syncs. These replace the cuDNN/cuBLAS/ATen
internals the reference leans on (SURVEY.md section 2b).
"""

from lintransunet_tpu.ops.patchify import windows_embedding, windows_unembedding
from lintransunet_tpu.ops.pool import max_pool3d, avg_pool2d
from lintransunet_tpu.ops.bbox import mask_boundary, min_max_indice, min_max_indice2
from lintransunet_tpu.ops.resample import (
    solid_back_index,
    solid_transfer_index,
    transfer_index,
    transfer_index_pix,
    transfer_back_index,
    transfer_back_index_pix,
    bilinear_weights,
    bilinear_weights_pix,
    separable_grid_sample_2d,
    resize_linear_align_corners,
    resize_nearest,
)
from lintransunet_tpu.ops.attention import linear_attention, softmax_attention
from lintransunet_tpu.ops.conv import conv3d, instance_norm, leaky_relu

__all__ = [
    "windows_embedding",
    "windows_unembedding",
    "max_pool3d",
    "avg_pool2d",
    "min_max_indice",
    "min_max_indice2",
    "mask_boundary",
    "transfer_index",
    "solid_transfer_index",
    "solid_back_index",
    "transfer_index_pix",
    "transfer_back_index",
    "transfer_back_index_pix",
    "bilinear_weights",
    "bilinear_weights_pix",
    "separable_grid_sample_2d",
    "resize_linear_align_corners",
    "resize_nearest",
    "linear_attention",
    "softmax_attention",
    "conv3d",
    "instance_norm",
    "leaky_relu",
]
