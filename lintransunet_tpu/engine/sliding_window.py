"""Fused sliding-window inference engine — the throughput path.

First-party replacement for ``monai.inferers.sliding_window_inference`` as
invoked by the reference (utils/utils_3D_embed_full.py:148,
inference_embed_attn.py:141: overlap=0.6, sigma_scale=0 -> constant
blending). TPU-first design:

* the window grid is STATIC (computed at trace time from the padded volume
  shape), so the whole scan compiles to one XLA program — no host round
  trips per window;
* windows are batched ``sw_batch_size`` at a time through one jitted
  forward; scatter-add blending runs on-device via dynamic_update_slice;
* the normalisation map (sum of importance over windows) is computed once
  per shape on the host and passed as a runtime operand — NOT baked into
  the HLO as a literal (a 512x512x192 f32 literal is ~200 MB of program);
* constant-mode blending skips the importance multiply entirely;
* variable scan depths are bucketed (pad depth up to a multiple) so a whole
  dataset reuses a handful of compiled programs.
"""

import functools
import math
import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# Unroll factor of the window scan (trace-time). >1 lets XLA overlap window
# i+1's canvas slice with window i's forward at the cost of program size;
# measured no-win at the default window geometry, kept as an A/B knob.
SCAN_UNROLL = int(os.environ.get("LINTRANSUNET_SCAN_UNROLL", "1"))

# Optimisation barriers at the predictor boundary inside the scan body
# (trace-time). The in-scan forward runs ~8 ms/window slower than the same
# forward standalone (docs/DESIGN.md §10) and the known failure mode on this
# model is layout/fusion context leaking across a boundary (the PEG fix,
# models/blocks.py). "in" barriers the sliced window batch, "pred" the
# predictor output, "both" both ends. Default "both": identity semantics,
# and the round-3 on-chip A/B measured +2.8 patches/s alone and +7.5 in
# the shipping paired+split combo (docs/DESIGN.md §10).
SCAN_BARRIER = os.environ.get("LINTRANSUNET_SCAN_BARRIER", "both")

# Split the window loop into TWO scans (trace-time flag): a forward-only
# scan that stacks every window's prediction (no canvas in scope — the
# predictor compiles in a context with no read-modify-write carry), then a
# trivial blend scan over the stacked buffer. Costs one
# (n_chunks, sw, N, *roi, C) buffer in the predictor's output dtype
# (~670 MB f32 / ~335 MB bf16 on the headline bench geometry) against the
# ~8 ms/window in-scan forward tax if that tax is the canvas carry.
# Default ON: bit-identical output (tested), and the round-3 on-chip A/B
# measured 231.8 patches/s for paired+barrier+split vs 228.4 without the
# split (it only pays WITH the barrier — paired+split alone regressed to
# 199.1; docs/DESIGN.md §10).
SCAN_SPLIT = os.environ.get("LINTRANSUNET_SCAN_SPLIT", "1") == "1"

# How the RUNNER executes a chunk of sw_batch_size windows (read at
# SlidingWindowRunner construction). The reference's sw_batch exists to
# amortise per-kernel launch overhead on GPU; under one jitted scan there
# is no launch overhead to amortise, and concatenating windows into a
# (sw*N, ...) batch measurably LOSES on TPU: HLO cost analysis shows
# exactly-linear FLOPs but +78% materialised intermediate traffic at
# batch 2 (experiments/sw_batch_flops.py) — XLA's fusion/layout choices
# degrade at the doubled shapes (standalone forward 112.6 -> 145.4
# ms/window, experiments/sw_batch_probe.py). "split" (= "auto") RE-CHUNKS
# the runner's window grid to sw=1 — every window runs through its own
# predictor call at the profitable batch, the blend accumulates in the
# identical sequential window order, and the grid needs no pad windows —
# while sw_batch keeps its MONAI grouping semantics at the API. Output is
# bit-identical for batch-equivariant predictors (true of every in-repo
# model; tested), which is therefore a REQUIREMENT of the runner's
# auto/split modes. "batch" honours the concatenated (sw*N, ...)
# execution verbatim. The raw ``sliding_window_inference`` function below
# always honours the requested sw_batch (faithful MONAI semantics for
# arbitrary predictors); this knob only shapes the grids the runner
# feeds it.
SW_EXEC = os.environ.get("LINTRANSUNET_SW_EXEC", "auto")

# Fold the runner's depth-bucket pad and final depth crop INTO the compiled
# volume program (trace-time flag). The eager pad / crop dispatches were two
# extra device programs per volume, and through the axon tunnel every
# program launch costs ~7-10 ms of device idle (round-5 runner-gap trace:
# ~28 ms device idle per volume boundary). E2E=1 (default) runs one
# program per volume, keyed on the REAL shape + chunk count; E2E=0 keys
# only on the padded shape (fewer compiled programs across a dataset with
# many distinct depths) at the cost of the two extra dispatches.
SW_E2E = os.environ.get("LINTRANSUNET_SW_E2E", "1") == "1"

# Static depth-region blending (trace-time flag, E2E path only). When the
# window grid covers H and W with a single window (the serving geometry:
# 512x512 roi on 512x512 volumes) and blending is constant-mode, the grid
# is a pure function of the real shape, so the blend is STATIC: between
# consecutive window-boundary depths every voxel is covered by the same
# set of windows, so the blended output is just (sum of those windows'
# slices) / count, concatenated along depth. This replaces the blend scan
# (canvas dynamic-update-slice read-modify-write per window), the 201 MB
# norm-map operand and the divide epilogue — ~12 ms/volume of the e2e
# program at the bench geometry — with one streaming pass over the
# prediction stack.
STATIC_BLEND = os.environ.get("LINTRANSUNET_STATIC_BLEND", "1") == "1"

# Fully unroll the STATIC_BLEND window loop into independent per-window
# forwards with static slices (trace-time flag; engages when the grid has
# at most this many windows, 0 = never). Without the scan's loop-carried
# sequencing XLA may overlap window i's bandwidth-bound fusions with
# window i+1's MXU convs. Costs ~n_windows x program size (slower compile
# per volume shape). Measured +1.5 patches/s on the bench geometry
# (290.3-290.4 vs 288.8 same session, barriers neutral); default 8.
STATIC_UNROLL_MAX = int(os.environ.get("LINTRANSUNET_STATIC_UNROLL", "8"))

# SCAN_SPLIT stacks every window's prediction before blending; that buffer
# is n_chunks*sw*N*prod(roi)*C_out elements of the predictor dtype and
# grows linearly with window count (a 24 GB OOM was hit in round 3 before
# the D*C lane merge). Above this many bytes the engine falls back to the
# fused single-scan path, which streams one window at a time.
SPLIT_MAX_BYTES = int(os.environ.get(
    "LINTRANSUNET_SPLIT_MAX_BYTES", str(4 * 1024 ** 3)))


def scan_interval(image_size: Sequence[int], roi_size: Sequence[int],
                  overlap: float) -> Tuple[int, ...]:
    """MONAI _get_scan_interval: 0 when roi covers the dim, else roi*(1-ov)."""
    out = []
    for im, roi in zip(image_size, roi_size):
        if roi == im:
            out.append(0)
        else:
            interval = int(roi * (1 - overlap))
            out.append(max(interval, 1))
    return tuple(out)


def window_starts_1d(size: int, roi: int, interval: int) -> list:
    """MONAI dense_patch_slices semantics: clip the last start to size-roi."""
    if interval == 0:
        return [0]
    count = int(math.ceil((size - roi) / interval)) + 1
    return [min(i * interval, size - roi) for i in range(count)]


def dense_window_starts(image_size, roi_size, overlap) -> np.ndarray:
    """(num_windows, ndim) int array of window origins."""
    intervals = scan_interval(image_size, roi_size, overlap)
    per_dim = [window_starts_1d(s, r, i)
               for s, r, i in zip(image_size, roi_size, intervals)]
    grid = np.meshgrid(*per_dim, indexing="ij")
    return np.stack([g.reshape(-1) for g in grid], axis=-1).astype(np.int32)


def gaussian_importance(roi_size, sigma_scale: float) -> np.ndarray:
    """MONAI GaussianFilter-style importance map (mode='gaussian')."""
    maps = []
    for r in roi_size:
        sigma = max(sigma_scale * r, 1e-3)
        x = np.arange(r, dtype=np.float64)
        centre = (r - 1) / 2.0
        maps.append(np.exp(-0.5 * ((x - centre) / sigma) ** 2))
    out = functools.reduce(np.multiply.outer, maps)
    out = np.clip(out, np.max(out) * 1e-3, None)
    return out.astype(np.float32)


def normalisation_map(padded_spatial, roi_size, overlap, mode="constant",
                      sigma_scale: float = 0.0) -> np.ndarray:
    """Sum of per-window importance at every voxel of the padded volume."""
    starts = dense_window_starts(padded_spatial, roi_size, overlap)
    imp = (gaussian_importance(roi_size, sigma_scale) if mode == "gaussian"
           else np.ones(roi_size, np.float32))
    norm = np.zeros(tuple(padded_spatial), np.float32)
    for sx, sy, sz in starts:
        norm[sx:sx + roi_size[0], sy:sy + roi_size[1], sz:sz + roi_size[2]] += imp
    return norm


def padded_spatial_shape(spatial, roi_size):
    return tuple(max(s, r) for s, r in zip(spatial, roi_size))


def _pad_to_roi(x: Array, roi_size) -> Tuple[Array, Tuple[Tuple[int, int], ...]]:
    """Symmetric pad so every spatial dim >= roi (MONAI pad semantics)."""
    pads = [(0, 0)]
    _, *spatial, _ = x.shape
    for s, r in zip(spatial, roi_size):
        diff = max(r - s, 0)
        half = diff // 2
        pads.append((half, diff - half))
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x, tuple(pads)


def _static_depth_run(x, roi_size, predictor, predictor_args,
                      starts_np, weights_np, out_channels,
                      region_epilogue=None):
    """Forward scan + static depth-region blend (STATIC_BLEND fast path).

    x: (N, H, W, D, C) with (H, W) == roi_size[:2]. All real windows start
    at (0, 0, s_z); between consecutive boundary depths every voxel is
    covered by the same static set of windows, so the blend is
    concat_regions(sum(member slices) / member count) — bit-equivalent to
    the canvas scan + norm divide for constant blending with unit weights
    (the reference call: overlap 0.6, sigma_scale=0).
    """
    n, h, w, d, c = x.shape
    rd = roi_size[2]
    starts_np = np.asarray(starts_np).reshape(-1, 3)
    weights_np = np.asarray(weights_np).reshape(-1)
    real = [i for i in range(starts_np.shape[0]) if weights_np[i] > 0]
    starts_d = [int(starts_np[i, 2]) for i in real]

    probe = jax.eval_shape(
        predictor, jax.ShapeDtypeStruct((n,) + roi_size + (c,), x.dtype),
        *predictor_args)
    if out_channels is None:
        out_channels = probe.shape[-1]

    def forward_one(win):
        if SCAN_BARRIER in ("in", "both"):
            win = jax.lax.optimization_barrier(win)
        pred = predictor(win, *predictor_args)
        if SCAN_BARRIER in ("pred", "both"):
            pred = jax.lax.optimization_barrier(pred)
        # merge (D, C) into one minor dim for lane-exact tiling (see the
        # SCAN_SPLIT note); bit-identical reshape.
        return pred.reshape((n,) + roi_size[:2] + (rd * out_channels,))

    if 0 < STATIC_UNROLL_MAX and starts_np.shape[0] <= STATIC_UNROLL_MAX:
        # independent per-window forwards on STATIC slices — no scan, no
        # loop-carried sequencing (see STATIC_UNROLL_MAX)
        preds = jnp.stack([
            forward_one(jax.lax.slice(
                x, (0, 0, 0, int(s), 0),
                (n, roi_size[0], roi_size[1], int(s) + rd, c)))
            for s in starts_np[:, 2]])
    else:
        starts_j = jnp.asarray(starts_np[:, 2], jnp.int32)
        _, preds = jax.lax.scan(
            lambda carry, s: (carry, forward_one(jax.lax.dynamic_slice(
                x, (0, 0, 0, s, 0), (n,) + roi_size + (c,)))),
            0, starts_j, unroll=min(SCAN_UNROLL, len(starts_j)))
    # preds: (n_windows, N, H, W, rd*C)

    bounds = sorted({s for s in starts_d} | {s + rd for s in starts_d})
    segs = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        members = [(idx, s) for idx, s in zip(real, starts_d)
                   if s <= a and b <= s + rd]
        acc = None
        for idx, s in members:
            view = preds[idx].reshape((n,) + roi_size + (out_channels,))
            sl = view[:, :, :, a - s:b - s, :].astype(jnp.float32)
            acc = sl if acc is None else acc + sl
        if len(members) > 1:
            # barrier the literal so XLA emits a true divide (it rewrites
            # x / const -> x * (1/const), 1 ulp off for non-power-of-2
            # counts) — keeps the static path bit-identical to the
            # operand-path canvas/norm divide.
            den = jax.lax.optimization_barrier(jnp.float32(len(members)))
            acc = acc / den
        if region_epilogue is not None:
            # elementwise epilogue (e.g. background derivation) fused into
            # the region pass — exact: f per region == f on the concat
            acc = region_epilogue(acc)
        segs.append(acc)
    return jnp.concatenate(segs, axis=3) if len(segs) > 1 else segs[0]


def sliding_window_inference(
    inputs: Array,
    roi_size: Sequence[int],
    sw_batch_size: int,
    predictor: Callable[[Array], Array],
    overlap: float = 0.6,
    mode: str = "constant",
    sigma_scale: float = 0.125,
    out_channels: Optional[int] = None,
    norm: Optional[Array] = None,
    importance: Optional[Array] = None,
    predictor_args: tuple = (),
    window_starts: Optional[Array] = None,
    window_weights: Optional[Array] = None,
    static_grid: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    region_epilogue=None,
) -> Array:
    """Blend per-window predictions over a full volume.

    inputs: (N, H, W, D, C). predictor: (M, h, w, d, C, *predictor_args) ->
    (M, h, w, d, C'). Pure and jittable. Pass ``norm`` (padded-spatial f32)
    and, for gaussian mode, ``importance`` (roi-shaped f32) as operands when
    jitting large volumes — otherwise they are derived at trace time (fine
    for tests). ``predictor_args`` (e.g. model params) are threaded through
    as traced operands so they are NOT baked into the compiled program.
    ``sigma_scale=0`` with mode='constant' reproduces the reference call.

    ``window_starts`` ((n_chunks, sw_batch_size, 3) int32) and
    ``window_weights`` ((n_chunks, sw_batch_size) f32) override the
    trace-time window grid as runtime OPERANDS: the compiled program then
    depends only on the chunk count, so a shape-bucketing caller (the
    runner) can key its jit cache on padded shapes while blending with the
    exact MONAI grid of the real extent. ``norm`` must be supplied with
    them. Weight-0 entries are pad windows whose predictions vanish.

    The requested ``sw_batch_size`` is honoured verbatim: each chunk runs
    the predictor ONCE on the concatenated (sw*N, ...) window batch,
    faithful to ``monai.inferers`` for arbitrary (even non-batch-
    equivariant) predictors. ``SlidingWindowRunner`` re-chunks to sw=1 by
    default for TPU throughput — see ``SW_EXEC``.
    """
    n, *orig_spatial, _ = inputs.shape
    roi_size = tuple(int(r) for r in roi_size)
    x, pads = _pad_to_roi(inputs, roi_size)
    _, h, w, d, c = x.shape

    if static_grid is not None:
        # Static depth-region blend (see STATIC_BLEND). Caller guarantees:
        # constant mode, sw_batch_size==1, single H/W window, unit weights
        # on real windows. starts/weights become trace-time constants; no
        # norm operand is needed (region counts are static).
        starts_np, weights_np = static_grid
        assert sw_batch_size == 1 and mode == "constant"
        assert (h, w) == roi_size[:2], (h, w, roi_size)
        out = _static_depth_run(
            x, roi_size, predictor, predictor_args, starts_np, weights_np,
            out_channels, region_epilogue=region_epilogue)
        if any(p != (0, 0) for p in pads):
            sl = tuple(slice(p[0], p[0] + s)
                       for p, s in zip(pads[1:4], orig_spatial))
            out = out[(slice(None),) + sl + (slice(None),)]
        return out

    if norm is None:
        if window_starts is not None:
            raise ValueError("explicit window_starts requires an explicit "
                             "norm map (the grid is unknown at trace time)")
        norm = jnp.asarray(
            normalisation_map((h, w, d), roi_size, overlap, mode, sigma_scale))
    norm_c = norm[None, :, :, :, None]

    imp_c = None
    if mode == "gaussian":
        if importance is None:
            importance = jnp.asarray(gaussian_importance(roi_size, sigma_scale))
        imp_c = importance[None, :, :, :, None]

    if window_starts is not None:
        starts_j = window_starts
        weights_j = window_weights
        n_chunks = starts_j.shape[0]
        assert weights_j is not None and weights_j.shape == starts_j.shape[:2]
    else:
        starts = dense_window_starts((h, w, d), roi_size, overlap)
        num_windows = starts.shape[0]
        # Pad the window list to a multiple of sw_batch_size; padded windows
        # get weight 0 so their predictions vanish in the blend.
        n_chunks = int(math.ceil(num_windows / sw_batch_size))
        padded = n_chunks * sw_batch_size
        weights = np.ones(padded, np.float32)
        weights[num_windows:] = 0.0
        starts_p = np.concatenate(
            [starts, np.zeros((padded - num_windows, 3), np.int32)], axis=0)
        starts_j = jnp.asarray(starts_p).reshape(n_chunks, sw_batch_size, 3)
        weights_j = jnp.asarray(weights).reshape(n_chunks, sw_batch_size)

    probe = jax.eval_shape(
        predictor,
        jax.ShapeDtypeStruct((sw_batch_size * n,) + roi_size + (c,), x.dtype),
        *predictor_args)
    if out_channels is None:
        out_channels = probe.shape[-1]

    def slice_window(start):
        return jax.lax.dynamic_slice(
            x, (0, start[0], start[1], start[2], 0), (n,) + roi_size + (c,))

    def forward_chunk(chunk_starts):
        windows = [slice_window(chunk_starts[i]) for i in range(sw_batch_size)]
        batch = jnp.concatenate(windows, axis=0)  # (sw*N, h, w, d, C)
        if SCAN_BARRIER in ("in", "both"):
            batch = jax.lax.optimization_barrier(batch)
        preds = predictor(batch, *predictor_args)
        if SCAN_BARRIER in ("pred", "both"):
            preds = jax.lax.optimization_barrier(preds)
        return preds.reshape(
            (sw_batch_size, n) + roi_size + (out_channels,))

    def blend_chunk(canvas, preds, chunk_starts, chunk_w):
        preds = preds.astype(jnp.float32)
        for i in range(sw_batch_size):
            contrib = preds[i] * chunk_w[i]
            if imp_c is not None:
                contrib = contrib * imp_c
            start = chunk_starts[i]
            idx = (0, start[0], start[1], start[2], 0)
            patch = jax.lax.dynamic_slice(
                canvas, idx, (n,) + roi_size + (out_channels,))
            canvas = jax.lax.dynamic_update_slice(canvas, patch + contrib, idx)
        return canvas

    def body(canvas, chunk):
        chunk_starts, chunk_w = chunk
        return blend_chunk(canvas, forward_chunk(chunk_starts),
                           chunk_starts, chunk_w), None

    canvas = jnp.zeros((n, h, w, d, out_channels), jnp.float32)
    stack_bytes = (n_chunks * sw_batch_size * n * math.prod(roi_size)
                   * out_channels * probe.dtype.itemsize)
    if SCAN_SPLIT and stack_bytes <= SPLIT_MAX_BYTES:
        # forward-only scan first (the predictor compiles with no canvas
        # read-modify-write in its fusion context), stacking predictions in
        # the predictor's OUTPUT dtype; then a trivial blend scan. The
        # astype(f32) moves into the blend, which is bit-identical (the
        # original also upcast straight off the predictor output).
        #
        # The stack merges (D, C) into one minor dim: a small C in the lane
        # position tile-pads C -> 128 (64x HBM inflation at C=2 — a measured
        # 24 GB OOM at sw_batch=2); D*C (= 128 for the headline geometry)
        # tiles exactly. The reshapes are row-major-free and bit-identical.
        stack_shape = (sw_batch_size, n) + roi_size + (out_channels,)
        merged = stack_shape[:-2] + (stack_shape[-2] * stack_shape[-1],)
        _, all_preds = jax.lax.scan(
            lambda c, s: (c, forward_chunk(s).reshape(merged)), 0, starts_j,
            unroll=min(SCAN_UNROLL, n_chunks))
        canvas, _ = jax.lax.scan(
            lambda c, t: (blend_chunk(c, t[0].reshape(stack_shape), *t[1:]),
                          None),
            canvas, (all_preds, starts_j, weights_j))
    else:
        canvas, _ = jax.lax.scan(body, canvas, (starts_j, weights_j),
                                 unroll=min(SCAN_UNROLL, n_chunks))
    out = canvas / norm_c

    if any(p != (0, 0) for p in pads):
        sl = tuple(slice(p[0], p[0] + s) for p, s in zip(pads[1:4], orig_spatial))
        out = out[(slice(None),) + sl + (slice(None),)]
    return out


class SlidingWindowRunner:
    """Shape-bucketing jit cache around sliding_window_inference.

    Volumes in a CT dataset vary in depth. The window grid and the
    normalisation map are always those of the REAL extent (after MONAI's
    symmetric pad-to-roi only), matching ``monai.inferers`` exactly — no
    window ever reads bucket-pad zeros. Bucketing pads the depth up to a
    multiple of ``depth_bucket`` and the window list up to a chunk multiple,
    both zero-cost for the blend, so one compiled program (keyed on padded
    shape + chunk count) serves every real depth in the bucket.

    Under the default ``SW_EXEC`` (auto = split) a requested
    ``sw_batch_size`` > 1 is re-chunked to 1: each window runs through its
    own predictor call (the profitable execution batch on TPU — see the
    SW_EXEC note above) and the grid never pays pad-window forwards. The
    output is identical iff the predictor is batch-equivariant (true of
    every in-repo model: InstanceNorm / attention / bbox are all
    per-sample; tested). For a non-batch-equivariant external predictor
    set ``LINTRANSUNET_SW_EXEC=batch`` to honour the reference's
    concatenated sw-batch execution verbatim.
    """

    def __init__(self, predictor, roi_size, sw_batch_size, overlap=0.6,
                 mode="constant", sigma_scale=0.0, depth_bucket=32,
                 chunk_bucket=1, derive_background=False):
        # chunk_bucket=1 (default) never pays pad-window forwards — the
        # honest-bench configuration. Raise it only when a dataset's depth
        # spread causes too many distinct compiled programs.
        #
        # derive_background: the predictor emits ONLY the class-1 channel
        # of a 2-class one-hot/softmax (make_eval_forward(fg_only=True));
        # the runner blends that single channel and reconstructs
        # ch0 = 1 - ch1 once per volume — exact for any blend weights
        # since sum(w*(1-p))/sum(w) == 1 - sum(w*p)/sum(w).
        self.derive_background = derive_background
        self.predictor = predictor
        self.roi_size = tuple(roi_size)
        # Split execution runs every window at its native batch, so chunk
        # the grid at sw=1: the window list then needs NO pad entries. (A
        # grid of 5 real windows at sw_batch=2 would otherwise pay a sixth,
        # wasted forward — a measured 15% on the headline geometry; round-3
        # queue-5 jobs 35/36 paid exactly that because this re-chunk used
        # to scale chunk_bucket by the requested sw.)
        if sw_batch_size > 1 and SW_EXEC in ("auto", "split"):
            sw_batch_size = 1
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.mode = mode
        self.sigma_scale = sigma_scale
        self.depth_bucket = depth_bucket
        self.chunk_bucket = chunk_bucket
        self._programs = {}
        self._grids = {}
        self._imp = None

    def _grid(self, real_shape, bucket_pad_norm=False):
        """Per real volume shape: (starts, weights, norm) with the MONAI
        grid of the pad-to-roi extent. ``bucket_pad_norm`` end-pads the
        norm map to the depth bucket with 1.0 (blend no-op) for the
        non-E2E path whose program shape is the bucketed volume."""
        key = (real_shape, bucket_pad_norm)
        if key in self._grids:
            return self._grids[key]
        spatial = padded_spatial_shape(real_shape[1:4], self.roi_size)
        starts = dense_window_starts(spatial, self.roi_size, self.overlap)
        num_windows = starts.shape[0]
        n_chunks = int(math.ceil(num_windows / self.sw_batch_size))
        n_chunks = int(math.ceil(n_chunks / self.chunk_bucket)) * self.chunk_bucket
        padded = n_chunks * self.sw_batch_size
        weights = np.ones(padded, np.float32)
        weights[num_windows:] = 0.0
        starts = np.concatenate(
            [starts, np.zeros((padded - num_windows, 3), np.int32)], axis=0)

        norm = normalisation_map(spatial, self.roi_size, self.overlap,
                                 self.mode, self.sigma_scale)
        if bucket_pad_norm:
            pad_d = (-spatial[2]) % self.depth_bucket
            if pad_d:  # bucket region: no contributions, divide stays benign
                norm = np.pad(norm, ((0, 0), (0, 0), (0, pad_d)),
                              constant_values=1.0)
        grid = (
            jax.device_put(starts.reshape(n_chunks, self.sw_batch_size, 3)),
            jax.device_put(weights.reshape(n_chunks, self.sw_batch_size)),
            jax.device_put(norm),
        )
        self._grids[key] = grid
        return grid

    def _compiled(self, padded_shape, n_chunks):
        key = (padded_shape, n_chunks)
        if key not in self._programs:
            run = functools.partial(
                sliding_window_inference,
                roi_size=self.roi_size,
                sw_batch_size=self.sw_batch_size,
                predictor=self.predictor,
                overlap=self.overlap,
                mode=self.mode,
                sigma_scale=self.sigma_scale,
            )
            if self.derive_background:
                def run_bg(*args, _run=run, **kw):
                    fg = _run(*args, **kw)
                    return jnp.concatenate([1.0 - fg, fg], axis=-1)
                self._programs[key] = jax.jit(run_bg)
            else:
                self._programs[key] = jax.jit(run)
        return self._programs[key]

    def _compiled_e2e(self, real_shape, n_chunks):
        """One program per volume: windows + blend + background derive in
        one jit (see SW_E2E). No depth-bucket pad — the program is keyed on
        the REAL shape anyway, so the canvas/epilogue run at the pad-to-roi
        extent (sliding_window_inference handles the sub-roi symmetric pad
        and crop itself). Returns (fn, wants_grid_operands): with the
        STATIC_BLEND fast path the grid is baked in as trace-time
        constants and the norm/starts operands are not taken."""
        key = ("e2e", real_shape, n_chunks)
        if key not in self._programs:
            run = functools.partial(
                sliding_window_inference,
                roi_size=self.roi_size,
                sw_batch_size=self.sw_batch_size,
                predictor=self.predictor,
                overlap=self.overlap,
                mode=self.mode,
                sigma_scale=self.sigma_scale,
            )
            derive_bg = self.derive_background

            spatial = padded_spatial_shape(real_shape[1:4], self.roi_size)
            use_static = (STATIC_BLEND and self.mode == "constant"
                          and self.sw_batch_size == 1
                          and spatial[:2] == self.roi_size[:2])
            if use_static:
                starts_np = dense_window_starts(
                    spatial, self.roi_size, self.overlap)
                num = starts_np.shape[0]
                pad = n_chunks - num
                weights_np = np.concatenate(
                    [np.ones(num, np.float32), np.zeros(pad, np.float32)])
                starts_np = np.concatenate(
                    [starts_np, np.zeros((pad, 3), np.int32)])
                grid = (starts_np, weights_np)

                epi = ((lambda fg: jnp.concatenate([1.0 - fg, fg],
                                                   axis=-1))
                       if derive_bg else None)

                def run_static(volume, predictor_args=()):
                    return run(volume, predictor_args=predictor_args,
                               static_grid=grid, region_epilogue=epi)

                self._programs[key] = (jax.jit(run_static), False)
            else:
                def run_e2e(volume, **kw):
                    out = run(volume, **kw)
                    if derive_bg:
                        out = jnp.concatenate([1.0 - out, out], axis=-1)
                    return out

                self._programs[key] = (jax.jit(run_e2e), True)
        return self._programs[key]

    def run_batch(self, volumes, *predictor_args, mesh=None):
        """Data-parallel multi-volume sliding-window inference.

        ``volumes``: list of (1, H, W, D_i, C) arrays sharing H/W/C. Each
        volume keeps ITS OWN exact MONAI window grid — starts, weights and
        normalisation map ride along as vmapped operands — while depths are
        end-padded to a common bucket so ONE compiled program serves the
        whole group. With ``mesh`` (a 1D data mesh whose size divides
        len(volumes)) the group dim is sharded over the data axis, so each
        chip blends its own volume (BASELINE config 5: batch-sharded
        multi-volume inference; the reference's analogue is DataParallel
        scattering windows, inference_embed_attn.py:89,141). Returns the
        per-volume outputs cropped to their original depths.
        """
        import math as _math

        b = len(volumes)
        _, h, w, _, c = volumes[0].shape
        roi_d = self.roi_size[2]
        depths = [int(v.shape[3]) for v in volumes]
        d_common = max(int(_math.ceil(max(dd, roi_d) / self.depth_bucket))
                       * self.depth_bucket for dd in depths)

        # MONAI pads sub-roi depths SYMMETRICALLY; do it here per volume so
        # the shared end-pad to d_common below never shifts real content.
        offsets = []
        prepped = []
        for v in volumes:
            diff = max(roi_d - v.shape[3], 0)
            half = diff // 2
            if diff:
                v = jnp.pad(v, ((0, 0), (0, 0), (0, 0),
                                (half, diff - half), (0, 0)))
            offsets.append(half)
            prepped.append(v)
        volumes = prepped

        grids = [self._grid((1, h, w, dd, c)) for dd in depths]
        n_chunks = max(g[0].shape[0] for g in grids)

        def pad_grid(starts, weights, norm):
            extra = n_chunks - starts.shape[0]
            if extra:
                starts = jnp.concatenate(
                    [starts, jnp.zeros((extra,) + starts.shape[1:],
                                       starts.dtype)])
                weights = jnp.concatenate(
                    [weights, jnp.zeros((extra,) + weights.shape[1:],
                                        weights.dtype)])
            pad_d = d_common - norm.shape[2]
            if pad_d:
                norm = jnp.pad(norm, ((0, 0), (0, 0), (0, pad_d)),
                               constant_values=1.0)
            return starts, weights, norm

        starts_b, weights_b, norm_b = (jnp.stack(t) for t in zip(
            *(pad_grid(*g) for g in grids)))
        vols_b = jnp.stack([
            jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, d_common - v.shape[3]),
                        (0, 0))) if v.shape[3] != d_common else v
            for v in volumes])

        if self.mode == "gaussian" and self._imp is None:
            self._imp = jax.device_put(
                gaussian_importance(self.roi_size, self.sigma_scale))

        key = ("dp", b, h, w, d_common, c, n_chunks, mesh is not None)
        if key not in self._programs:
            def one(vol, starts, weights, norm, args):
                out = sliding_window_inference(
                    vol, self.roi_size, self.sw_batch_size, self.predictor,
                    overlap=self.overlap, mode=self.mode,
                    sigma_scale=self.sigma_scale, norm=norm,
                    importance=self._imp, predictor_args=args,
                    window_starts=starts, window_weights=weights)
                if self.derive_background:
                    out = jnp.concatenate([1.0 - out, out], axis=-1)
                return out

            batched = jax.vmap(one, in_axes=(0, 0, 0, 0, None))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard = NamedSharding(mesh, P(mesh.axis_names[0]))
                repl = NamedSharding(mesh, P())
                self._programs[key] = jax.jit(
                    batched,
                    in_shardings=(shard, shard, shard, shard, repl))
            else:
                self._programs[key] = jax.jit(batched)
        out = self._programs[key](vols_b, starts_b, weights_b, norm_b,
                                  predictor_args)
        return [out[i, :, :, :, offsets[i]:offsets[i] + depths[i]]
                for i in range(b)]

    def __call__(self, volume: Array, *predictor_args) -> Array:
        """predictor_args (e.g. params) are traced operands, safe to update
        between calls without recompiling or staling."""
        n, h, w, d, c = volume.shape
        if self.mode == "gaussian" and self._imp is None:
            self._imp = jax.device_put(
                gaussian_importance(self.roi_size, self.sigma_scale))

        if SW_E2E:
            spatial = padded_spatial_shape(volume.shape[1:4], self.roi_size)
            num = dense_window_starts(
                spatial, self.roi_size, self.overlap).shape[0]
            n_chunks = int(math.ceil(num / self.sw_batch_size))
            n_chunks = (int(math.ceil(n_chunks / self.chunk_bucket))
                        * self.chunk_bucket)
            fn, wants_grid = self._compiled_e2e(volume.shape, n_chunks)
            if not wants_grid:
                return fn(volume, predictor_args=predictor_args)
            starts, weights, norm = self._grid(volume.shape)
            return fn(volume, norm=norm, importance=self._imp,
                      predictor_args=predictor_args,
                      window_starts=starts, window_weights=weights)

        starts, weights, norm = self._grid(volume.shape, bucket_pad_norm=True)
        # symmetric pad-to-roi (MONAI), then end-pad depth to the bucket
        d_roi = max(d, self.roi_size[2])
        pad_d = (-d_roi) % self.depth_bucket
        if pad_d:
            volume = jnp.pad(volume,
                             ((0, 0), (0, 0), (0, 0), (0, pad_d), (0, 0)))
        fn = self._compiled(volume.shape, starts.shape[0])
        out = fn(volume, norm=norm, importance=self._imp,
                 predictor_args=predictor_args,
                 window_starts=starts, window_weights=weights)
        return out[:, :, :, :d] if out.shape[3] != d else out
