"""Mask-derived ROI bounding boxes, fully vectorised (no per-sample host loop).

Replaces the reference's CDF bbox extraction (``get_min_max_indice``,
Unet_3Dblock.py:37-49) and the per-sample Python clamping loop inside
``ROIBridge.get_mask_boundary2`` (Unet_3Dblock.py:821-873) — the single
worst TPU hazard in the reference (a host sync per sample per level).
Here everything is branch-free jnp running on-device; boxes are *values*,
never shapes, so the whole forward stays statically shaped under jit.
"""

import jax
import jax.numpy as jnp


def min_max_indice(hist: jnp.ndarray, threshold: float = 0.001):
    """Quantile extent of a 1D nonnegative histogram.

    Mirrors ``get_min_max_indice`` (Unet_3Dblock.py:37-49):
    ratio = cumsum/total; min = searchsorted(ratio, t, left);
    max = searchsorted(ratio, 1-t, right); mid = searchsorted(ratio, .5, right).
    Empty histogram falls back to the volume centre (L/2 - 1, L/2 + 1, L/2).

    searchsorted on a monotone array == a comparison count, which maps to a
    single VPU reduction instead of a binary search.
    """
    hist = hist.astype(jnp.float32)
    total = jnp.sum(hist)
    length = hist.shape[0]
    ratio = jnp.cumsum(hist) / total  # NaN when total==0; masked out below.
    lo = jnp.sum(ratio < threshold).astype(jnp.float32)
    hi = jnp.sum(ratio <= (1.0 - threshold)).astype(jnp.float32)
    mid = jnp.sum(ratio <= 0.5).astype(jnp.float32)
    centre = jnp.float32(length / 2.0)
    empty = total == 0
    return (
        jnp.where(empty, centre - 1.0, lo),
        jnp.where(empty, centre + 1.0, hi),
        jnp.where(empty, centre, mid),
    )


def min_max_indice2(hist: jnp.ndarray, threshold: float = 1e-5):
    """Peak-relative extent variant (``get_min_max_indice2``,
    Unet_3Dblock.py:10-35; not used by the live path, kept for parity).

    Finds the nearest below-threshold bins on each side of the histogram
    peak; falls back to the array ends when a side has none.
    """
    hist = hist.astype(jnp.float32)
    length = hist.shape[0]
    ratio = hist / jnp.max(hist)
    below = ratio <= threshold
    peak = jnp.argmax(hist)
    idx = jnp.arange(length)
    left_mask = below & (idx <= peak)
    right_mask = below & (idx >= peak)
    lo = jnp.max(jnp.where(left_mask, idx, 0))
    lo = jnp.where(jnp.any(left_mask), lo, 0)
    hi = jnp.min(jnp.where(right_mask, idx, length - 1))
    hi = jnp.where(jnp.any(right_mask), hi, length - 1)
    none_below = jnp.logical_not(jnp.any(below))
    lo = jnp.where(none_below, 0, lo)
    hi = jnp.where(none_below, length - 1, hi)
    return lo, hi, peak


def _clamped_extent(lo, hi, centre, min_roi, full):
    """Vectorised port of the 4-way clamp in get_mask_boundary2 (lines 850-871).

    Both reference clamps read the SAME ``min_roi`` limit: extents smaller
    than ``min_roi`` are grown to it, extents larger than ``full - min_roi``
    are shrunk to that (there is no separate max-ROI parameter in the
    reference). The two sequential ``if``s both test the *pre-clamp* extent;
    when ``full < 2*min_roi`` both fire and the later (`too_big`) rewrite
    wins — the jnp.where ordering reproduces that (pinned by
    tests/test_ops.py::test_mask_boundary_matches_reference_loop).
    """
    size = hi - lo
    too_small = size < min_roi
    lo = jnp.where(too_small, jnp.maximum(centre - min_roi / 2.0, 0.0), lo)
    hi = jnp.where(too_small, jnp.minimum(centre + min_roi / 2.0, full), hi)
    too_big = size > (full - min_roi)
    lo = jnp.where(too_big, jnp.maximum(centre - (full - min_roi) / 2.0, 0.0), lo)
    hi = jnp.where(too_big, jnp.minimum(centre + (full - min_roi) / 2.0, full), hi)
    return lo, hi


def mask_boundary(mask: jnp.ndarray, min_h_roi: int, min_w_roi: int) -> jnp.ndarray:
    """(N, H, W, D) boolean/float mask -> (N, 6) boundary boxes.

    Box layout matches the reference: (x0, y0, z0, x1, y1, z1) where x indexes
    H, y indexes W, and the depth extent is always the full volume
    (Unet_3Dblock.py:845). Runs as one fused vectorised pass over the batch.
    """
    mask = mask.astype(jnp.float32)
    n, h, w, _ = mask.shape
    hist_x = jnp.sum(mask, axis=(2, 3))  # (N, H)
    hist_y = jnp.sum(mask, axis=(1, 3))  # (N, W)

    vmapped = jax.vmap(min_max_indice)
    x0, x1, xc = vmapped(hist_x)
    y0, y1, yc = vmapped(hist_y)

    x0, x1 = _clamped_extent(x0, x1, xc, float(min_h_roi), float(h))
    y0, y1 = _clamped_extent(y0, y1, yc, float(min_w_roi), float(w))

    d = mask.shape[3]
    z0 = jnp.zeros((n,), jnp.float32)
    z1 = jnp.full((n,), float(d - 1), jnp.float32)
    return jnp.stack([x0, y0, z0, x1, y1, z1], axis=1)
