"""Fisheye ROI warping as separable batched matmuls (the TPU grid_sample).

The reference warps each skip-connection feature map into a fixed-size ROI
crop with ``F.grid_sample`` over a piecewise-linear "fisheye" grid
(Unet_3Dblock.py:51-82, 985-1039, 1080-1117). The key structural fact the
TPU build exploits: those grids are *separable* — the x-coordinate depends
only on the output row and the y-coordinate only on the output column. A
separable bilinear warp is exactly two dense matmuls with tent-kernel weight
matrices, which run on the MXU with zero gathers and differentiate cleanly.
Zero-padding out-of-range samples falls out of the tent weights for free.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _precision(dtype):
    """'highest' for f32 parity; default (fast native) for bf16 compute.

    On TPU, f32 matmuls default to bf16-precision passes, which breaks
    parity with the CPU/torch oracle; 'highest' restores true f32. For bf16
    inputs the default path is already the native MXU mode — forcing
    'highest' there would trigger multi-pass emulation for nothing.
    """
    return "highest" if dtype == jnp.float32 else None


def transfer_index_pix(x0, x1, h, roi_size: int, eval_roi_size: int) -> jnp.ndarray:
    """Forward fisheye grid in PIXEL units (full-image coords per ROI pixel).

    The [-1, 1] normalisation of ``transfer_index`` exists only to match
    ``F.grid_sample``'s convention; ``bilinear_weights`` immediately undoes
    it. The pixel form skips the round-trip (and its f32 rounding).
    """
    x0 = jnp.asarray(x0, jnp.float32).reshape(-1, 1)
    x1 = jnp.asarray(x1, jnp.float32).reshape(-1, 1)
    idx = jnp.arange(eval_roi_size, dtype=jnp.float32)[None, :]
    k2 = (x1 - x0) / (roi_size - 1)
    k1 = (h - x1 + x0) / (eval_roi_size - roi_size)
    out = idx * k2 + x0 * (1 - k2 / k1)
    low = out * (k1 / k2) + x0 * (1 - k1 / k2)
    out = jnp.where(out <= x0, low, out)
    high = out * (k1 / k2) + x1 * (1 - k1 / k2)
    out = jnp.where(out >= x1, high, out)
    return out


def transfer_index(x0, x1, h, roi_size: int, eval_roi_size: int) -> jnp.ndarray:
    """Forward fisheye grid: full-image coords sampled for each ROI pixel.

    Vectorised port of ``get_transfer_index`` (Unet_3Dblock.py:51-64).
    x0, x1: (B,) box extents (float). h: scalar (H-1, "real distance").
    Returns (B, eval_roi_size) normalised coords in [-1, 1] (align_corners).
    Inside [x0, x1] the grid advances at slope k2 (zoomed-in, roi_size of the
    output pixels span the box); outside at slope k1 (context, squeezed).
    """
    return transfer_index_pix(x0, x1, h, roi_size, eval_roi_size) * 2.0 / h - 1.0


def transfer_back_index_pix(x0, x1, h, roi_size: int,
                            eval_roi_size: int) -> jnp.ndarray:
    """Inverse fisheye grid in ROI-pixel units (over the eval_roi_size
    scale; see transfer_back_index for the normalised form)."""
    x0 = jnp.asarray(x0, jnp.float32).reshape(-1, 1)
    x1 = jnp.asarray(x1, jnp.float32).reshape(-1, 1)
    idx = jnp.arange(int(h) + 1, dtype=jnp.float32)[None, :]
    k2 = roi_size / (x1 - x0)
    k1 = (eval_roi_size - roi_size) / (h - x1 + x0)
    p0 = x0 * k1
    p1 = eval_roi_size - (h - x1) * k1
    out = idx * k2 + p0 * (1 - k2 / k1)
    low = out * (k1 / k2) + p0 * (1 - k1 / k2)
    out = jnp.where(out <= p0, low, out)
    high = out * (k1 / k2) + p1 * (1 - k1 / k2)
    out = jnp.where(out >= p1, high, out)
    return out


def transfer_back_index(x0, x1, h, roi_size: int, eval_roi_size: int) -> jnp.ndarray:
    """Inverse fisheye grid: ROI coords sampled for each full-image pixel.

    Vectorised port of ``get_transfer_back_index`` (Unet_3Dblock.py:66-82).
    Returns (B, h+1) normalised coords over the eval_roi_size axis.
    """
    return (transfer_back_index_pix(x0, x1, h, roi_size, eval_roi_size)
            * 2.0 / eval_roi_size - 1.0)


def solid_transfer_index(x0, x1, h, eval_roi_size: int) -> jnp.ndarray:
    """Identity-slope fisheye variant (``get_solid_transfer_index``,
    Unet_3Dblock.py:84-102; unused by the live path, kept for parity).
    Slope 1 inside the box, linear squeeze outside."""
    x0 = jnp.asarray(x0, jnp.float32).reshape(-1, 1)
    x1 = jnp.asarray(x1, jnp.float32).reshape(-1, 1)
    idx = jnp.arange(eval_roi_size, dtype=jnp.float32)[None, :]
    k1 = (h - x1 + x0) / (eval_roi_size - 1 - x1 + x0)
    out = idx + x0 * (1 - 1 / k1)
    out = jnp.where(out <= x0, idx * k1, out)
    out = jnp.where(out >= x1, (idx - eval_roi_size + 1) * k1 + h, out)
    return out * 2.0 / h - 1.0


def solid_back_index(x0, x1, h, eval_roi_size: int) -> jnp.ndarray:
    """Inverse of solid_transfer_index (``get_solid_back_index``,
    Unet_3Dblock.py:104-120; unused by the live path, kept for parity)."""
    x0 = jnp.asarray(x0, jnp.float32).reshape(-1, 1)
    x1 = jnp.asarray(x1, jnp.float32).reshape(-1, 1)
    idx = jnp.arange(int(h) + 1, dtype=jnp.float32)[None, :]
    k1 = (eval_roi_size - 1 - x1 + x0) / (h - x1 + x0)
    p0 = x0 * k1
    p1 = eval_roi_size - 1 - (h - x1) * k1
    out = idx + p0 * (1 - k1)
    out = jnp.where(out <= p0, out * k1 + p0 * (1 - k1), out)
    out = jnp.where(out >= p1, out * k1 + p1 * (1 - k1), out)
    return out * 2.0 / (eval_roi_size - 1) - 1.0


def bilinear_weights_pix(pix: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """(B, M) PIXEL coords -> (B, M, in_size) tent weights.

    Row i holds the bilinear interpolation weights of output sample i over
    the input axis. Out-of-range samples get all-zero rows (== grid_sample
    padding_mode='zeros'); partially-out-of-range samples keep only the
    in-bounds neighbour's weight, exactly like torch.
    """
    grid = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pix[..., None] - grid))


def bilinear_weights(coords: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """(B, M) normalised align_corners coords -> (B, M, in_size) tent weights."""
    pix = (coords.astype(jnp.float32) + 1.0) * 0.5 * (in_size - 1)
    return bilinear_weights_pix(pix, in_size)


def separable_grid_sample_2d(
    x: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray
) -> jnp.ndarray:
    """Warp (N, H, W, D, C) by per-batch separable weights.

    wx: (N, OH, H), wy: (N, OW, W). Equivalent to batched 2D bilinear
    grid_sample applied slice-by-slice over depth, but expressed as two
    MXU matmuls contracting H then W. Written as explicit dot_generals whose
    output dim order needs no transposition (batch dims + lhs free + rhs
    free) — the einsum form lowered to a far slower program on TPU.
    """
    dt = x.dtype
    prec = _precision(dt)
    # (n, oh, h) x (n, h, w, d, c) -> (n, oh, w, d, c)
    t = jax.lax.dot_general(
        wx.astype(dt), x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))), precision=prec)
    # (n, ow, w) x (n, oh, w, d, c) -> (n, ow, oh, d, c) -> transpose oh/ow
    t2 = jax.lax.dot_general(
        wy.astype(dt), t,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))), precision=prec)
    return t2.transpose(0, 2, 1, 3, 4)


def _linear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Static (out, in) align_corners linear interpolation matrix."""
    if in_size == 1 or out_size == 1:
        src = np.zeros((out_size,), np.float32)
    else:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    grid = np.arange(in_size, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(src[:, None] - grid[None, :]))
    return w.astype(np.float32)


def resize_linear_align_corners(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Trilinear upsample with align_corners=True over (N, H, W, D, C).

    Mirrors ``nn.Upsample(mode='trilinear', align_corners=True)``
    (Unet_3Dblock.py:1341-1345). Implemented as per-axis matmuls against
    compile-time-constant interpolation matrices, so XLA maps the whole
    resize onto the MXU rather than scalar gathers.
    """
    if isinstance(scale, (int, float)):
        scale = (scale, scale, scale)
    n, h, w, d, c = x.shape
    oh, ow, od = (int(round(s * v)) for s, v in zip(scale, (h, w, d)))
    dt = x.dtype
    prec = _precision(dt)

    def axis_matmul(m, x, axis):
        # (o, s) x (..., s, ...) -> contraction placed LAST in the lhs-free
        # output so the result comes out as (o, <other dims>) and moveaxis
        # restores order; for axis-1 of an N=1 tensor this is a pure reshape.
        out = jax.lax.dot_general(
            m, x, dimension_numbers=(((1,), (axis,)), ((), ())),
            precision=prec)
        return jnp.moveaxis(out, 0, axis)

    if oh != h:
        x = axis_matmul(jnp.asarray(_linear_resize_matrix(h, oh), dt), x, 1)
    if ow != w:
        x = axis_matmul(jnp.asarray(_linear_resize_matrix(w, ow), dt), x, 2)
    if od != d:
        x = axis_matmul(jnp.asarray(_linear_resize_matrix(d, od), dt), x, 3)
    return x


def resize_nearest(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Nearest-neighbour upsample over (N, H, W, D, C).

    Matches ``nn.Upsample(scale_factor=s)`` default mode='nearest'
    (UpEmbedBlock, Unet_3Dblock.py:421): out[i] = in[floor(i / s)].
    For integer scale this is a pure repeat, which XLA lowers to a broadcast.
    """
    if isinstance(scale, (int, float)):
        scale = (scale, scale, scale)
    for axis, s in zip((1, 2, 3), scale):
        s = int(s)
        if s != 1:
            x = jnp.repeat(x, s, axis=axis)
    return x
