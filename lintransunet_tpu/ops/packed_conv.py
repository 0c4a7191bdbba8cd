"""Exact space-to-channel packed 3D convolutions (the small-C TPU fix).

Motivation (measured on v5e): XLA conv efficiency scales with channel count
— ~3.7 TFLOP/s at C=16, ~30 at C=64, ~62 at C=128 — because a small minor
dim wastes vector lanes across the whole op (and pointwise/elementwise ops
pay an ~8x physical padding tax at C=16). The UNet's top levels run at
C=16/32, so they dominate wall-clock despite modest FLOPs.

Fix: compute the SAME convolution on a 2x2-in-(H, W) space-to-channel packed
layout (ops.patchify.windows_embedding: packed channel = c*4 + a*2 + b for
sub-position (a, b)). The packed kernel below is an exact linear transform of
the original kernel, so results are bit-for-bit the same function (up to
float reassociation):

* stride-1 k=3 conv  -> packed k=3 conv over 4C -> 4C' channels;
* stride-2 k=3 conv  -> packed k=2 conv, stride 1, padding (1, 0),
  emitting UNPACKED channels (the output lives on the coarser grid).

Packed kernels are 4x the FLOPs but run at ~8x the efficiency, and every
surrounding elementwise/norm op sees a 4x-fuller minor dim.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops.conv import (IN_STATS, NORM_APPLY, _stats_input,
                                       apply_norm, conv3d, moment_stats)

# Read once at import time: this flag is consulted at TRACE time inside
# jitted model code, so mutating the env var after programs are compiled
# (and cached) could never take effect anyway. Import-time freeze makes the
# contract explicit: set LINTRANSUNET_CONV3D=1 before importing the package.
FORCE_CONV3D = os.environ.get("LINTRANSUNET_CONV3D") == "1"

# Stride-1 conv formulation on the FOLDED layout ("3d" = one NDHWC conv,
# "taps" = three depth-shifted 2D convs, "auto" = by channel width).
# Measured (v5e, experiments/folded_chain_bench.py): "3d" wins at 4C=64
# (11.8 vs 9.7 TF/s useful), "taps" at 4C=128 (36.9 vs 32.5). Frozen at
# import for the same trace-time reason as FORCE_CONV3D.
FOLDED_S1_FORMULATION = os.environ.get("LINTRANSUNET_FOLDED_S1", "auto")

# Whether packed model levels run in the FOLDED layout (fold depth into the
# batch dim once per region) instead of the packed 5D layout with per-conv
# folds. Default ON: measured 185.0 vs 179.9 patches/s on the headline
# bench (v5e, round 3) and it composes with the 8C depth-pair work.
# Frozen at import (trace-time flag).
FOLDED_LAYOUT_DEFAULT = os.environ.get("LINTRANSUNET_FOLDED", "1") != "0"

# Whether narrow packed levels (4C <= 64) additionally run in the PAIRED
# (8C depth-pair) layout — see the paired op section below. Default ON:
# the round-3 on-chip A/B measured 224.3 vs 202.1 patches/s on the
# headline bench and 257.8 vs 300.0 ms/step on training (v5e,
# /tmp/r3q results archived in docs/DESIGN.md §10). Frozen at import
# (trace-time flag).
PAIRED_LAYOUT_DEFAULT = os.environ.get("LINTRANSUNET_PAIRED", "1") != "0"


def resolve_s1_formulation(c4: int, formulation: str = None) -> str:
    """Resolve the folded stride-1 formulation for a 4C-lane conv.

    "sheared" (pack_kernel_stride1_sheared_jnp + the realign pass, 16/9x
    FLOPs) is only reachable via explicit request — callers that own the
    kernel transform (models.packed.PackedConv) dispatch on this."""
    f = formulation or FOLDED_S1_FORMULATION
    if f == "auto":
        return "3d" if c4 <= 64 else "taps"
    if f == "sheared64":
        # sheared only where the dense formulation is COMPUTE-bound (4C at
        # or below the MXU K=64 half-width, where folded "3d" sits at the
        # ~49 TF/s cap); wider levels keep the measured "taps" winner.
        return "sheared" if c4 <= 64 else "taps"
    if f == "dspatial64":
        # dspatial only on the narrow levels where it beats every other
        # formulation isolated (L0 chain 7.25 ms vs 3d 15.67 / paired 9.57,
        # experiments/dspatial_probe.py); at 4C=128 taps measured equal.
        return "dspatial" if c4 <= 64 else "taps"
    return f


def _pack_selector(n_block: int, offset: int) -> np.ndarray:
    """(n_block, 2, [2,] 3) constant 0/1 tensor S[B, a, (A,) h] = 1 iff the
    original tap dh = 2*(B + offset) + a (- A) lands in [-1, 1], h = dh+1.

    The kernel pack transforms were previously built with .at[].set()
    advanced indexing, which XLA lowers to SCATTERS — the round-4 train
    trace attributed ~20 ms/step to those scatters and their gather VJPs
    (the transform differentiates every step in training). As einsums with
    these tiny constants they are two small dots with matmul VJPs; each
    output slot receives at most one term, so the result is bit-identical.
    """
    s = np.zeros((n_block, 2, 2, 3), np.float32)
    for bi in range(n_block):
        for a in range(2):
            for alpha in range(2):
                dh = 2 * (bi + offset) + a - alpha
                if -1 <= dh <= 1:
                    s[bi, a, alpha, dh + 1] = 1.0
    return s


_SEL_S1 = _pack_selector(3, -1)  # stride-1: dh = 2*(B-1) + a - A, tap dh+1


def _sel_s2() -> np.ndarray:
    """Stride-2 selector: (bi, a) -> RAW tap index 2*bi + a - 1 in [0, 2]
    ((0,0) falls off the kernel), matching pack_kernel_stride2's taps map."""
    s = np.zeros((2, 2, 3), np.float32)
    for bi in range(2):
        for a in range(2):
            tap = 2 * bi + a - 1
            if 0 <= tap <= 2:
                s[bi, a, tap] = 1.0
    return s


_SEL_S2 = _sel_s2()


def pack_kernel_stride1_jnp(kernel: jnp.ndarray) -> jnp.ndarray:
    """Traced-array version of pack_kernel_stride1 (for in-jit transforms of
    live parameters; runs once per compilation). Scatter-free: two small
    einsum contractions against constant 0/1 selectors (see _pack_selector).
    """
    kh, kw, kd, c, o = kernel.shape
    s = jnp.asarray(_SEL_S1, kernel.dtype)
    out = jnp.einsum("HaAh,WbBw,hwdco->HWdcaboAB", s, s, kernel)
    return out.reshape(3, 3, kd, 4 * c, 4 * o)


def pack_kernel_stride2_jnp(kernel: jnp.ndarray) -> jnp.ndarray:
    """Traced-array version of pack_kernel_stride2 (scatter-free einsum)."""
    kh, kw, kd, c, o = kernel.shape
    s = jnp.asarray(_SEL_S2, kernel.dtype)
    out = jnp.einsum("Hah,Wbw,hwdco->HWdcabo", s, s, kernel)
    return out.reshape(2, 2, kd, 4 * c, o)


def pack_kernel_stride1_sheared_jnp(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, kd, C, O) -> SHEARED packed kernel (2, 2, kd, 4C, 4O).

    The dense packed 3x3 kernel (pack_kernel_stride1) is only 25% dense, so
    the packed conv burns 4x the original FLOPs multiplying zeros. Shearing
    exploits that output sub-position alpha=1 at block m-1 reads EXACTLY the
    same two-block window {m-1, m} as alpha=0 at block m (per axis): one
    2x2-block-tap conv computes alpha/beta=0 outputs at their own block and
    alpha/beta=1 outputs shifted one block down/right, and cheap offset
    slices realign (packed_conv3d_stride1_sheared). 9 of 16 slots per
    output are live -> 16/9 of the ORIGINAL FLOPs, 2.25x fewer than dense.

    Entry rule: input fine row = 2*(m-1+bi)+a, output fine row = 2m-2+alpha
    => tap dh = 2*bi + a - 2 + alpha, valid iff dh in [-1, 1] (same for w).
    """
    kh, kw, kd, c, o = kernel.shape
    out = jnp.zeros((2, 2, kd, 4 * c, 4 * o), kernel.dtype)
    ci_base = jnp.arange(c) * 4
    co_base = jnp.arange(o) * 4
    for bi in (0, 1):
        for bj in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    for alpha in (0, 1):
                        for beta in (0, 1):
                            dh = 2 * bi + a - 2 + alpha
                            dw = 2 * bj + b - 2 + beta
                            if -1 <= dh <= 1 and -1 <= dw <= 1:
                                ci = ci_base + a * 2 + b
                                co = co_base + alpha * 2 + beta
                                out = out.at[bi, bj, :,
                                             ci[:, None], co[None, :]].set(
                                    kernel[dh + 1, dw + 1].transpose(1, 2, 0))
    return out


def packed_conv3d_stride1_sheared(x_packed: jnp.ndarray, sheared_kernel,
                                  bias=None, kd_pad: int = 1) -> jnp.ndarray:
    """Sheared-packed equivalent of conv3d(stride=1, padding=1).

    Pads one block on every H/W side, runs the 2x2-block-tap conv (output
    one block larger per axis), then realigns: output sub-position group
    (alpha, beta) is the (H2, W2) slice starting at (alpha, beta). The
    realign is one slice+stack pass — negligible next to the 2.25x conv
    FLOP cut. Bit-identical function to packed_conv3d_stride1.
    """
    y = jnp.pad(x_packed, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    y = conv3d(y, sheared_kernel, bias=bias, stride=1,
               padding=(0, 0, kd_pad))
    n, hp, wp, d, c4 = y.shape
    h2, w2 = hp - 1, wp - 1
    parts = [y[:, alpha:alpha + h2, beta:beta + w2, :, alpha * 2 + beta::4]
             for alpha in (0, 1) for beta in (0, 1)]
    out = jnp.stack(parts, axis=-1)  # (N, H2, W2, D, O, 4)
    return out.reshape(n, h2, w2, d, c4)


def pack_kernel_1x1_jnp(kernel: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, 1, C, O) -> (1, 1, 1, 4C, 4O) block-diagonal over sub-positions."""
    _, _, _, c, o = kernel.shape
    w = kernel[0, 0, 0]  # (C, O)
    eye = jnp.eye(4, dtype=kernel.dtype)
    k = w[:, None, :, None] * eye[None, :, None, :]  # (C, 4, O, 4)
    return k.reshape(1, 1, 1, 4 * c, 4 * o)


def pack_bias_jnp(bias: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(bias, 4)


def packed_scale(x_packed: jnp.ndarray, gate_packed: jnp.ndarray,
                 channels: int) -> jnp.ndarray:
    """Multiply packed (…, 4C) features by a packed (…, 4) 1-channel gate."""
    shape = x_packed.shape
    g = gate_packed.reshape(shape[:-1] + (1, 4))
    x = x_packed.reshape(shape[:-1] + (channels, 4))
    return (x * g.astype(x.dtype)).reshape(shape)


def pack_kernel_stride1(kernel: np.ndarray) -> np.ndarray:
    """(3, 3, kd, C, O) -> (3, 3, kd, 4C, 4O) packed-equivalent kernel.

    Output sub-position (alpha, beta), input sub-position (a, b), block
    offsets (DI, DJ) in {-1, 0, 1}: tap (dh, dw) contributes iff
    dh = 2*DI + a - alpha in [-1, 1] (same for w).
    """
    kh, kw, kd, c, o = kernel.shape
    assert kh == 3 and kw == 3, "stride-1 packing derived for k=3"
    # channel-major packing: packed_in = c*4 + a*2 + b, packed_out = o*4 + ...
    out = np.zeros((3, 3, kd, 4 * c, 4 * o), kernel.dtype)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    for alpha in (0, 1):
                        for beta in (0, 1):
                            dh = 2 * di + a - alpha
                            dw = 2 * dj + b - beta
                            if -1 <= dh <= 1 and -1 <= dw <= 1:
                                src = kernel[dh + 1, dw + 1]  # (kd, C, O)
                                ci = np.arange(c) * 4 + a * 2 + b
                                co = np.arange(o) * 4 + alpha * 2 + beta
                                out[di + 1, dj + 1][:, ci[:, None], co[None, :]] = src
    return out


def pack_kernel_stride2(kernel: np.ndarray) -> np.ndarray:
    """(3, 3, kd, C, O) -> (2, 2, kd, 4C, O) for the stride-2 downsample conv.

    The strided conv's output lives on the packed (coarse) grid directly:
    output m reads original rows 2m-1..2m+1 = packed blocks {m-1 (sub 1),
    m (subs 0, 1)}; with left padding 1, kernel tap 0 is block m-1.
    """
    kh, kw, kd, c, o = kernel.shape
    assert kh == 3 and kw == 3
    out = np.zeros((2, 2, kd, 4 * c, o), kernel.dtype)
    # (bi, a) -> dh' tap index in the original kernel
    taps = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (bi, a), dh in taps.items():
        for (bj, b), dw in taps.items():
            src = kernel[dh, dw]  # (kd, C, O)
            ci = np.arange(c) * 4 + a * 2 + b
            out[bi, bj][:, ci, :] = src
    return out


def packed_conv3d_stride1(x_packed: jnp.ndarray, packed_kernel, bias=None,
                          kd_pad: int = 1) -> jnp.ndarray:
    """Packed-layout equivalent of conv3d(stride=1, padding=1).

    Computed as THREE depth-shifted 2D convolutions with depth folded into
    the batch dimension: XLA's TPU conv2d lowering runs these ~1.6x faster
    than the equivalent conv3d at the model's packed shapes (measured 78.9
    vs 48.4 raw TFLOP/s on the decoder-L0 conv, v5e;
    experiments/conv_formulation_bench.py). Depth shifts are sliced
    per-volume so multi-sample batches never leak across volumes.
    """
    kd = packed_kernel.shape[2]
    if kd != 3 or kd_pad != 1 or FORCE_CONV3D:
        return conv3d(x_packed, packed_kernel, bias=bias, stride=1,
                      padding=(1, 1, kd_pad))
    # match conv3d's implicit kernel-to-input dtype cast (torch semantics)
    packed_kernel = packed_kernel.astype(x_packed.dtype)
    n, h2, w2, d, c4 = x_packed.shape
    o4 = packed_kernel.shape[-1]
    pad = jnp.pad(x_packed, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    out = None
    for dp in range(3):
        xs = pad[:, :, :, dp:dp + d, :]
        xb = xs.transpose(0, 3, 1, 2, 4).reshape(n * d, h2, w2, c4)
        y = jax.lax.conv_general_dilated(
            xb, packed_kernel[:, :, dp], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    out = out.reshape(n, d, h2, w2, o4).transpose(0, 2, 3, 1, 4)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def packed_conv3d_stride2(x_packed: jnp.ndarray, packed_kernel, bias=None,
                          z_stride: int = 1, kd_pad: int = 1) -> jnp.ndarray:
    """Packed-layout equivalent of conv3d(stride=(2, 2, z), padding=1).

    Output channels are UNPACKED (the result sits on the packed grid).
    """
    y = jnp.pad(x_packed, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    return conv3d(y, packed_kernel, bias=bias, stride=(1, 1, z_stride),
                  padding=(0, 0, kd_pad))


def pack_bias_stride1(bias: np.ndarray) -> np.ndarray:
    """(O,) -> (4O,) replicated per sub-position (channel-major packing)."""
    return np.repeat(bias, 4)


def group_instance_norm_packed(x_packed: jnp.ndarray, channels: int,
                               eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over packed (N, H/2, W/2, D, 4C): stats per ORIGINAL
    channel pool over (spatial x 4 sub-positions) — exactly the unpacked
    InstanceNorm's statistics."""
    n, h, w, d, c4 = x_packed.shape
    assert c4 == 4 * channels
    x_packed = _stats_input(x_packed)
    x32 = x_packed.astype(jnp.float32).reshape(n, h, w, d, channels, 4)
    mean, rstd = moment_stats(x32, (1, 2, 3, 5), eps)
    if NORM_APPLY == "affine":
        mean_l = jnp.repeat(mean[..., 0], 4, -1).reshape(n, 1, 1, 1, c4)
        rstd_l = jnp.repeat(rstd[..., 0], 4, -1).reshape(n, 1, 1, 1, c4)
        return apply_norm(x_packed, mean_l, rstd_l)
    out = (x32 - mean) * rstd
    return out.reshape(n, h, w, d, c4).astype(x_packed.dtype)


def packed_upsample_x2(x: jnp.ndarray, z2: bool = False) -> jnp.ndarray:
    """Trilinear x2 (align_corners) upsample emitting the PACKED layout.

    x: unpacked (N, H, W, D, C) -> packed (N, H, W, D*, 4C) representing the
    (2H, 2W, D*) upsampled tensor, D* = 2D if z2. Equivalent to
    pack(resize_linear_align_corners(x, (2, 2, z))) but never materialises
    the full-resolution unpacked intermediate (which pays the small-C lane
    tax twice). Exactness follows from separability of the trilinear resize.
    """
    import jax

    from lintransunet_tpu.ops.resample import _linear_resize_matrix

    n, h, w, d, c = x.shape
    dt = x.dtype
    wh = jnp.asarray(_linear_resize_matrix(h, 2 * h).reshape(h, 2, h), dt)
    ww = jnp.asarray(_linear_resize_matrix(w, 2 * w).reshape(w, 2, w), dt)

    # contract H: (n, h, w, d, c) x (h_out, a, h) -> (n, w, d, c, h_out, a)
    t = jax.lax.dot_general(x, wh, (((1,), (2,)), ((), ())))
    # contract W: (n, w, d, c, ho, a) x (w_out, b, w) -> (n, d, c, ho, a, wo, b)
    t = jax.lax.dot_general(t, ww, (((1,), (2,)), ((), ())))
    # -> (n, ho, wo, d, c, a, b) -> channel-major packed (c*4 + a*2 + b)
    t = t.transpose(0, 3, 5, 1, 2, 4, 6)
    out = t.reshape(n, h, w, d, 4 * c)
    if z2:
        wd = jnp.asarray(_linear_resize_matrix(d, 2 * d), dt)
        out = jax.lax.dot_general(wd, out, (((1,), (3,)), ((), ())))
        out = jnp.moveaxis(out, 0, 3)
    return out


# --------------------------------------------------------------------------
# FOLDED layout: depth carried in the batch dimension.
#
# The depth-folded conv above pays a fold (transpose) + unfold per CALL;
# xplane traces of the eval window show XLA shuttling the (64,128,128,C)
# intermediates between three layouts per tap — ~29 ms/window of pure
# layout copies, dominated by these folds (docs/DESIGN.md §10). The ops
# below keep whole decoder levels IN the folded representation
# (N*D, H/2, W/2, 4C), row index = volume*D + depth, so the fold happens
# once per region instead of once per conv. Every op here is
# transpose-free: depth handling uses leading-dim reshapes (n*d <-> (n, d))
# which never move data.
# --------------------------------------------------------------------------

def fold_depth(x_packed: jnp.ndarray) -> jnp.ndarray:
    """Packed (N, H2, W2, D, 4C) -> folded (N*D, H2, W2, 4C).

    The one real transpose of the folded regime — call it once per level
    (or region), not per conv."""
    n, h2, w2, d, c4 = x_packed.shape
    return x_packed.transpose(0, 3, 1, 2, 4).reshape(n * d, h2, w2, c4)


def unfold_depth(xf: jnp.ndarray, n_volumes: int) -> jnp.ndarray:
    """Folded (N*D, H2, W2, 4C) -> packed (N, H2, W2, D, 4C). Inverse of
    fold_depth (the closing transpose of a folded region)."""
    nd, h2, w2, c4 = xf.shape
    d = nd // n_volumes
    x = xf.reshape(n_volumes, d, h2, w2, c4)
    return x.transpose(0, 2, 3, 1, 4)


# dimension_numbers for the "dspatial" formulation: lhs (ND, H2, W2, C)
# with batch=H2, feature=C, spatial=(rows, W2); rhs (kd, kw, C, O); output
# dims mirror the lhs.
_DN_DSPATIAL = jax.lax.ConvDimensionNumbers(
    lhs_spec=(1, 3, 0, 2), rhs_spec=(3, 2, 0, 1), out_spec=(1, 3, 0, 2))


def _conv3d_s1_folded_dspatial(xf: jnp.ndarray, kp: jnp.ndarray,
                               bias=None) -> jnp.ndarray:
    """See packed_conv3d_stride1_folded's "dspatial" docstring (n==1)."""
    h2 = xf.shape[1]

    def conv_ds(x, k):
        # x: (ND, H2', W2, C); k: (kd, kw, C, O) -> (ND, H2', W2, O)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN_DSPATIAL)

    # per-kh kernel slice: (kw, kd, C, O) -> (kd, kw, C, O)
    k = [kp[kh].transpose(1, 0, 2, 3) for kh in range(3)]
    out = conv_ds(xf, k[1])
    out = out + jnp.pad(conv_ds(xf[:, :h2 - 1], k[0]),
                        ((0, 0), (1, 0), (0, 0), (0, 0)))
    out = out + jnp.pad(conv_ds(xf[:, 1:], k[2]),
                        ((0, 0), (0, 1), (0, 0), (0, 0)))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def packed_conv3d_stride1_folded(xf: jnp.ndarray, packed_kernel, bias=None,
                                 n_volumes: int = 1,
                                 formulation: str = None) -> jnp.ndarray:
    """packed_conv3d_stride1 on the FOLDED layout (transpose-free).

    xf: (N*D, H2, W2, 4C); packed_kernel: (3, 3, 3, 4C, 4O) from
    pack_kernel_stride1_jnp. Bit-identical function to
    packed_conv3d_stride1 on the unfolded view. Two formulations:

    * "3d": the folded buffer IS (N, D, H2, W2, 4C) up to a free
      leading-dim reshape, so the whole conv is ONE conv_general_dilated
      with depth as the leading spatial dim — no pads, slices or
      transposes outside the conv op itself.
    * "taps": three depth-shifted 2D convs (the formulation that beats
      conv3d 1.6x on the unfolded path); depth shifts are leading-dim row
      slices of the per-volume zero-padded buffer.
    * "dspatial": batch=H2, spatial=(rows, W2) via explicit
      ConvDimensionNumbers. XLA lays the folded buffer out {3,0,2,1} —
      rows second-minor (sublane), H major-most — so the "taps" row shifts
      are sublane shifts that XLA must materialise, while H-slices are
      free views. dspatial moves the depth taps INSIDE the conv (the
      conv's zero padding at the row ends is exactly the n_volumes=1
      semantics) and runs the 3 kh taps on free H-slices with their
      outputs padded back (the pads fuse into the adds). Same MACs;
      single-volume only (the conv would leak across interior volume
      boundaries), n_volumes>1 falls back to "taps". Tap regrouping
      (kd-major -> kh-major partial sums) makes this within-ulp, not
      bitwise, vs the other formulations. Isolated L0 chain: 7.25 ms vs
      3d 15.67 / taps ~9.8 / paired-pads 9.57 (dspatial_probe.py, v5e).
    """
    formulation = resolve_s1_formulation(xf.shape[-1], formulation)
    assert packed_kernel.shape[2] == 3, "folded path expects kd == 3"
    packed_kernel = packed_kernel.astype(xf.dtype)
    nd, h2, w2, c4 = xf.shape
    d = nd // n_volumes
    o4 = packed_kernel.shape[-1]
    if formulation == "dspatial":
        if n_volumes == 1:
            return _conv3d_s1_folded_dspatial(xf, packed_kernel, bias)
        formulation = "taps"
    if formulation == "3d":
        x5 = xf.reshape(n_volumes, d, h2, w2, c4)
        kd_first = packed_kernel.transpose(2, 0, 1, 3, 4)  # (kd, kh, kw, I, O)
        y = jax.lax.conv_general_dilated(
            x5, kd_first, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out = y.reshape(nd, h2, w2, o4)
    else:
        if n_volumes == 1:
            # Slice the 4D tensor directly: the 5D reshape below creates a
            # logically-distinct alias of the conv operand, and XLA emits a
            # SECOND physically-identical relayout copy for it next to the
            # conv's own ({3,0,2,1} vs {4,1,3,2,0} — same minor-to-major
            # order; copy.1211/copy.1212 on the round-4 eval trace, ~1.2 ms
            # each on the L0-paired twin of this path).
            pad = jnp.pad(xf, ((1, 1), (0, 0), (0, 0), (0, 0)))
            xslices = [pad[dp:dp + d] for dp in range(3)]
        else:
            x5 = xf.reshape(n_volumes, d, h2, w2, c4)
            pad = jnp.pad(x5, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            xslices = [pad[:, dp:dp + d].reshape(nd, h2, w2, c4)
                       for dp in range(3)]
        out = None
        for dp, xs in enumerate(xslices):
            y = jax.lax.conv_general_dilated(
                xs, packed_kernel[:, :, dp], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def packed_conv3d_stride1_sheared_folded(xf: jnp.ndarray, sheared_kernel,
                                         bias=None,
                                         n_volumes: int = 1) -> jnp.ndarray:
    """packed_conv3d_stride1_sheared on the FOLDED layout.

    Same 2x2-block-tap trick (16/9 of the ORIGINAL FLOPs vs the dense
    packed kernel's 4x — see pack_kernel_stride1_sheared_jnp), with depth
    riding the leading spatial dim of one NDHWC conv. The realign is one
    slice+stack pass on the conv output. Bit-identical function to
    packed_conv3d_stride1_folded.
    """
    sheared_kernel = sheared_kernel.astype(xf.dtype)
    nd, h2, w2, c4 = xf.shape
    d = nd // n_volumes
    o4 = sheared_kernel.shape[-1]
    x5 = xf.reshape(n_volumes, d, h2, w2, c4)
    x5 = jnp.pad(x5, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    kd_first = sheared_kernel.transpose(2, 0, 1, 3, 4)  # (kd, 2, 2, 4C, 4O)
    y = jax.lax.conv_general_dilated(
        x5, kd_first, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # y: (N, D, H2+1, W2+1, 4O); realign sub-position group (alpha, beta)
    parts = [y[:, :, alpha:alpha + h2, beta:beta + w2, alpha * 2 + beta::4]
             for alpha in (0, 1) for beta in (0, 1)]
    out = jnp.stack(parts, axis=-1)  # (N, D, H2, W2, O, 4)
    out = out.reshape(nd, h2, w2, o4)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# How the folded stride-2 downsample conv lowers (trace-time): "ndhwc" =
# one conv_general_dilated with depth as the leading spatial dim; "taps" =
# kd depth-tap 2D NHWC convs summed, with the depth stride as (strided)
# leading-dim row slices. The round-4 eval trace clocked the ndhwc form at
# ~13 TF/s with XLA re-tiling the spatial dims ([64,128,8,17,*] shapes)
# and a T(2,128) output layout that forces relayout copies on both sides
# — the same pathology the stride-1 "taps" formulation fixed (1.6x there).
# Full-bench A/B (same session, 2026-08-19): taps 258.2 vs ndhwc 251.8
# patches/s (+2.6%) -> taps is the default.
S2_FORMULATION = os.environ.get("LINTRANSUNET_S2", "taps")

# Whether a PAIRED level's downsample consumes the paired layout directly
# (packed_conv3d_stride2_paired) instead of unfold_pairs-then-folded-s2.
# Kills the unfold's pad+relayout copies (~2.2 ms/window at the L0->L1
# crossing on the round-4 eval trace) and runs the in-pair taps at K=8C.
S2_PAIRED = os.environ.get("LINTRANSUNET_S2_PAIRED", "1") == "1"


def packed_conv3d_stride2_folded(xf: jnp.ndarray, packed_kernel, bias=None,
                                 n_volumes: int = 1, z_stride: int = 1,
                                 kd_pad: int = 1,
                                 formulation: str = None) -> jnp.ndarray:
    """packed_conv3d_stride2 on the FOLDED layout.

    xf: folded packed (N*D, H2, W2, 4C); packed_kernel: (2, 2, kd, 4C, O)
    from pack_kernel_stride2_jnp. Returns folded UNPACKED
    (N*D', H2, W2, O), D' = out-depth of the strided conv — the downsample
    output lives on the same packed grid (see packed_conv3d_stride2).
    The asymmetric (1, 0) H/W padding is passed to the conv directly.
    """
    packed_kernel = packed_kernel.astype(xf.dtype)
    nd, h2, w2, c4 = xf.shape
    d = nd // n_volumes
    o = packed_kernel.shape[-1]
    kd = packed_kernel.shape[2]
    if (formulation or S2_FORMULATION) == "taps" and n_volumes == 1:
        d_out = (d + 2 * kd_pad - kd) // z_stride + 1
        pad = jnp.pad(xf, ((kd_pad, kd_pad), (0, 0), (0, 0), (0, 0)))
        out = None
        for t in range(kd):
            xs = jax.lax.slice(
                pad, (t, 0, 0, 0),
                (t + (d_out - 1) * z_stride + 1, h2, w2, c4),
                (z_stride, 1, 1, 1))
            y = jax.lax.conv_general_dilated(
                xs, packed_kernel[:, :, t], (1, 1), [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out
    x5 = xf.reshape(n_volumes, d, h2, w2, c4)
    kd_first = packed_kernel.transpose(2, 0, 1, 3, 4)  # (kd, 2, 2, I, O)
    y = jax.lax.conv_general_dilated(
        x5, kd_first, (z_stride, 1, 1),
        [(kd_pad, kd_pad), (1, 0), (1, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    out = y.reshape(n_volumes * y.shape[1], h2, w2, o)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def packed_conv1x1_folded(xf: jnp.ndarray, packed_kernel,
                          bias=None) -> jnp.ndarray:
    """Pointwise conv on the folded layout (packed 1x1 kernels from
    pack_kernel_1x1_jnp, block-diagonal over sub-positions)."""
    packed_kernel = packed_kernel.astype(xf.dtype)
    out = jax.lax.conv_general_dilated(
        xf, packed_kernel[:, :, 0], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# How IN statistics are computed on the folded/paired layouts (trace-time):
# "reduce" = fused sibling jnp.mean reductions (ride the producing conv's
# output fusion); "unfused" = an optimization_barrier on the bf16 input
# forces the stats OUT of the producer fusion into a standalone reduce;
# "dot" = MXU contractions — a ones-matvec for the sums and the diagonal
# of a batched Gram x^T x for the square sums (exact f32 accumulation of
# bf16 products).
#
# Why "unfused" exists (round-4 measurement, experiments/in_stats_probe.py
# + the fresh eval trace): a STANDALONE sum/sumsq reduce streams at
# 1.2-2x the bandwidth floor, but embedded the reduce rides the producing
# conv-epilogue fusion as a multi-output (stats, stats, y) fusion that
# runs ~5x over floor (1.75 ms on a 134 MB L0 buffer vs 0.33 floor) —
# ~18 ms/window across the [128]/[64]/[32]-output stat fusions. The
# barrier trades ONE extra clean read of y (~0.2-0.3 ms) for the fast
# standalone reduce emitter.
# (IN_STATS / _stats_input live in ops/conv.py and are imported above.)


def _mxu_group_stats(xr: jnp.ndarray, group_sum, count: int, eps: float):
    """Per-volume lane stats via MXU contractions.

    xr: (n, M, L) in the tensor dtype. group_sum: (n, L) -> (n, C) lane
    group reduction. Returns per-group (mean, rstd), f32."""
    n, m, l = xr.shape
    ones = jnp.ones((m,), xr.dtype)
    sums = jax.lax.dot_general(
        xr, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (n, L)
    gram = jax.lax.dot_general(
        xr, xr, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (n, L, L)
    sqs = jnp.diagonal(gram, axis1=1, axis2=2)         # (n, L)
    mean = group_sum(sums) / count
    var = jnp.maximum(group_sum(sqs) / count - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _lane_norm(xf: jnp.ndarray, n_volumes: int, pool, tile, count: int,
               eps: float) -> jnp.ndarray:
    """Lane-preserving instance norm on a folded (N*D', H, W, L) tensor.

    The stat reduction keeps the lane dim end to end: a spatial-only
    per-row f32 sum/sumsq (VPU-native lane accumulation), a tiny per-volume
    row regroup on the (N*D', L) result, then ``pool``/``tile`` map lanes
    <-> stat groups on (N, L)-sized data. The normalise then broadcasts
    (N, L) lane vectors over the tensor's OWN 4D shape.

    Why (round-4): the previous form reshaped the tensor to split sub-lane
    group axes (e.g. (n, dp, h, w, 2, C, 4)) and reduced ACROSS them —
    the logically-distinct alias forced relayout copies at the consumer
    boundary (copy.1168 on the round-4 eval trace) and put cross-sub-lane
    work inside the big pass. Formula-identical to moment_stats
    (single-pass E[x^2]-E[x]^2, clamped, rsqrt(var+eps)); only the
    reduction ORDER changes (f32 accumulation throughout).
    """
    nd, h, w, lanes = xf.shape
    xf = _stats_input(xf)
    x32 = xf.astype(jnp.float32)
    s1 = x32.sum((1, 2))             # (nd, L) per-row per-lane
    s2 = jnp.square(x32).sum((1, 2))
    if n_volumes == 1:
        s1 = s1.sum(0, keepdims=True)    # (1, L)
        s2 = s2.sum(0, keepdims=True)
    else:
        d = nd // n_volumes
        s1 = s1.reshape(n_volumes, d, lanes).sum(1)   # (n, L)
        s2 = s2.reshape(n_volumes, d, lanes).sum(1)
    g1, g2 = pool(s1), pool(s2)      # (n, groups)
    mean = g1 / count
    var = jnp.maximum(g2 / count - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_l, rstd_l = tile(mean), tile(rstd)   # (n, L)
    if n_volumes > 1:
        d = nd // n_volumes
        mean_l = jnp.repeat(mean_l, d, axis=0)   # (nd, L)
        rstd_l = jnp.repeat(rstd_l, d, axis=0)
        return apply_norm(xf, mean_l[:, None, None, :],
                          rstd_l[:, None, None, :],
                          x32=x32)
    return apply_norm(xf, mean_l[0], rstd_l[0], x32=x32)


def group_instance_norm_folded(xf: jnp.ndarray, channels: int,
                               n_volumes: int = 1,
                               eps: float = 1e-5) -> jnp.ndarray:
    """group_instance_norm_packed on the folded layout.

    Stats per (volume, original channel) over (depth-rows x spatial x 4
    sub-positions) — identical statistics to the unfolded op."""
    nd, h, w, c4 = xf.shape
    assert c4 == 4 * channels
    d = nd // n_volumes
    if IN_STATS == "dot":
        xr = xf.reshape(n_volumes, d * h * w, c4)
        mean, rstd = _mxu_group_stats(
            xr, lambda s: s.reshape(n_volumes, channels, 4).sum(-1),
            d * h * w * 4, eps)
        mean_l = jnp.repeat(mean, 4, axis=-1)[:, None, None, None, :]
        rstd_l = jnp.repeat(rstd, 4, axis=-1)[:, None, None, None, :]
        x32 = xf.astype(jnp.float32).reshape(n_volumes, d, h, w, c4)
        return ((x32 - mean_l) * rstd_l).reshape(nd, h, w, c4).astype(xf.dtype)
    return _lane_norm(
        xf, n_volumes,
        pool=lambda s: s.reshape(-1, channels, 4).sum(-1),
        tile=lambda m: jnp.repeat(m, 4, axis=-1),
        count=d * h * w * 4, eps=eps)


def instance_norm_folded(xf: jnp.ndarray, n_volumes: int = 1,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Plain InstanceNorm on a folded UNPACKED (N*D, H, W, C) tensor.

    Stats per (volume, channel) over (depth-rows x H x W) — identical to
    ops.instance_norm on the unfolded (N, H, W, D, C) view."""
    nd, h, w, c = xf.shape
    d = nd // n_volumes
    if IN_STATS == "dot":
        xr = xf.reshape(n_volumes, d * h * w, c)
        mean, rstd = _mxu_group_stats(xr, lambda s: s, d * h * w, eps)
        x32 = xf.astype(jnp.float32).reshape(n_volumes, d, h, w, c)
        return ((x32 - mean[:, None, None, None, :])
                * rstd[:, None, None, None, :]).reshape(
                    nd, h, w, c).astype(xf.dtype)
    return _lane_norm(xf, n_volumes, pool=lambda s: s, tile=lambda m: m,
                      count=d * h * w, eps=eps)


def unpack_folded(xf: jnp.ndarray) -> jnp.ndarray:
    """Folded packed (ND, H2, W2, 4C) -> folded UNPACKED (ND, H, W, C).

    Per-row windows_unembedding (channel c*4 + a*2 + b -> spatial offset
    (a, b)); depth never moves."""
    nd, h2, w2, c4 = xf.shape
    c = c4 // 4
    x = xf.reshape(nd, h2, w2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(nd, h2 * 2, w2 * 2, c)


def pack_folded(xf: jnp.ndarray) -> jnp.ndarray:
    """Folded unpacked (ND, H, W, C) -> folded packed (ND, H/2, W/2, 4C)."""
    nd, h, w, c = xf.shape
    x = xf.reshape(nd, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(nd, h // 2, w // 2, 4 * c)


def _upsample_hw_pack(xf: jnp.ndarray) -> jnp.ndarray:
    """The H/W 2x align-corners upsample of a folded row tensor
    (rows, H, W, L) with the (a, b) output phases packed as the two minor
    lane factors: (rows, H, W, 4L), lane = l*4 + a*2 + b."""
    from lintransunet_tpu.ops.resample import _linear_resize_matrix

    nd, h, w, c = xf.shape
    dt = xf.dtype
    wh = jnp.asarray(_linear_resize_matrix(h, 2 * h).reshape(h, 2, h), dt)
    ww = jnp.asarray(_linear_resize_matrix(w, 2 * w).reshape(w, 2, w), dt)

    # contract H: (nd, h, w, c) x (ho, a, h) -> (nd, w, c, ho, a)
    t = jax.lax.dot_general(xf, wh, (((1,), (2,)), ((), ())))
    # contract W: (nd, w, c, ho, a) x (wo, b, w) -> (nd, c, ho, a, wo, b)
    t = jax.lax.dot_general(t, ww, (((1,), (2,)), ((), ())))
    t = t.transpose(0, 2, 4, 1, 3, 5)  # (nd, ho, wo, c, a, b)
    return t.reshape(nd, h, w, 4 * c)


def packed_upsample_x2_paired(xf: jnp.ndarray,
                              n_volumes: int = 1) -> jnp.ndarray:
    """fold_pairs(packed_upsample_x2_folded(xf)) computed pair-FIRST.

    Pairing the UNPACKED folded input (a quarter of the packed output's
    bytes) makes the H/W upsample contractions emit the paired lane order
    (g, c, a, b) directly: lane = (g*C + c)*4 + a*2 + b = g*4C + c*4 +
    a*2 + b. One full-tensor transpose instead of two (the upsample's
    own + fold_pairs' 8C one). Bit-identical to the two-step form — the
    dot contractions are the same multiplies; only lane bookkeeping
    moves. Depth doubling (z2) is unsupported: pairs must be formed on
    the FINAL depth grid, so z2 levels keep the two-step form."""
    return _upsample_hw_pack(fold_pairs(xf, n_volumes))


def packed_upsample_x2_packed_in(xp: jnp.ndarray, n_volumes: int = 1,
                                 z2: bool = False,
                                 pair: bool = False) -> jnp.ndarray:
    """packed_upsample_x2_folded(unpack_folded(xp)) WITHOUT the unpack.

    xp: folded PACKED (N*D, H2, W2, 4C) [lane = c*4 + a~*2 + b~]. The H
    contraction merges the packed row index with the sub-lane phase a~ —
    contract dims (H2, a~) of the lane-split 6D view against the
    align-corners matrix reshaped (H2', a, H2, a~) — and likewise W with
    b~, so the unpack transpose (and its materialisation) never exists.
    Bit-identical to the unpack-then-upsample form: every output is the
    same <=2-term sum (align-corners 2x rows have <=2 nonzeros), and
    adding the dot's remaining exact zeros is exact.

    pair=True additionally pairs depth rows FIRST (valid only with
    z2=False, asserted) and returns the PAIRED (N*D/2, 2H2, 2W2, 8C)
    tensor directly: after fold_pairs the lane order is
    (g*C + c)*4 + a~*2 + b~, so the same (lanes/4, 2, 2) split applies.
    """
    from lintransunet_tpu.ops.resample import _linear_resize_matrix

    if pair:
        assert not z2, "pair-first upsample needs the depth untouched"
        xp = fold_pairs(xp, n_volumes)
    nd, h2, w2, c4 = xp.shape
    q = c4 // 4  # (g*)C lane groups
    dt = xp.dtype
    wh = jnp.asarray(
        _linear_resize_matrix(2 * h2, 4 * h2).reshape(2 * h2, 2, h2, 2), dt)
    ww = jnp.asarray(
        _linear_resize_matrix(2 * w2, 4 * w2).reshape(2 * w2, 2, w2, 2), dt)
    x6 = xp.reshape(nd, h2, w2, q, 2, 2)
    # contract (H2, a~): (nd, h2, w2, q, a~, b~) x (ho, a, h2, a~)
    #   -> (nd, w2, q, b~, ho, a)
    t = jax.lax.dot_general(x6, wh, (((1, 4), (2, 3)), ((), ())))
    # contract (W2, b~): -> (nd, q, ho, a, wo, b)
    t = jax.lax.dot_general(t, ww, (((1, 3), (2, 3)), ((), ())))
    t = t.transpose(0, 2, 4, 1, 3, 5)  # (nd, ho, wo, q, a, b)
    out = t.reshape(nd, 2 * h2, 2 * w2, 4 * q)
    if z2:
        d = nd // n_volumes
        wd = jnp.asarray(_linear_resize_matrix(d, 2 * d), dt)
        x5 = out.reshape(n_volumes, d, 2 * h2 * 2 * w2 * 4 * q)
        y = jax.lax.dot_general(wd, x5, (((1,), (1,)), ((), ())))
        out = y.transpose(1, 0, 2).reshape(
            n_volumes * 2 * d, 2 * h2, 2 * w2, 4 * q)
    return out


def packed_upsample_x2_folded(xf: jnp.ndarray, n_volumes: int = 1,
                              z2: bool = False) -> jnp.ndarray:
    """packed_upsample_x2 on the folded layout.

    xf: folded UNPACKED (N*D, H, W, C) -> folded packed (N*D*, H, W, 4C)
    representing the (2H, 2W, D*) trilinear align-corners upsample,
    D* = 2D if z2. H/W are per-row contractions; the depth doubling is a
    matrix contraction over the (reshaped) leading depth dim.
    """
    from lintransunet_tpu.ops.resample import _linear_resize_matrix

    nd, h, w, c = xf.shape
    dt = xf.dtype
    out = _upsample_hw_pack(xf)
    if z2:
        d = nd // n_volumes
        wd = jnp.asarray(_linear_resize_matrix(d, 2 * d), dt)
        x5 = out.reshape(n_volumes, d, h * w * 4 * c)
        y = jax.lax.dot_general(wd, x5, (((1,), (1,)), ((), ())))
        # (2d, n, m) -> (n, 2d, m): leading-pair swap, then re-merge rows
        out = y.transpose(1, 0, 2).reshape(n_volumes * 2 * d, h, w, 4 * c)
    return out


# --------------------------------------------------------------------------
# PAIRED (8C) layout: depth pairs folded into channels on top of the folded
# layout — (N*D/2, H2, W2, 8C), lane index = g*4C + (c*4 + a*2 + b) with
# g = depth parity (g-MAJOR: the two depth sub-lanes are contiguous halves,
# so boundary taps slice half-lanes without a lane shuffle).
#
# Why: at L0 the 4C lane width is 64, capping the stride-1 conv at the
# K=N=64 MXU rate (~49 raw TF/s). In the paired layout the IN-PAIR part of
# the 3x3x3 conv (depth taps delta in {-1, 0} for g_out=1 / {0, +1} for
# g_out=0 — 2 of its 3 depth taps) is ONE dense (3, 3, 8C, 8O) 2D conv at
# K=N=128, and only the two BOUNDARY depth taps run at 4C width. Total
# inflation stays 4x (the spatial packing's), but 2/3 of the FLOPs move to
# the full-width MXU rate.
# --------------------------------------------------------------------------

def fold_pairs(xf: jnp.ndarray, n_volumes: int = 1) -> jnp.ndarray:
    """Folded packed (N*D, H2, W2, 4C) -> paired (N*D/2, H2, W2, 8C).

    Rows (volume, depth) pair up as (volume, depth//2); parity g becomes
    the MAJOR half of the lane dim. One real transpose — pay it once per
    region."""
    nd, h2, w2, c4 = xf.shape
    d = nd // n_volumes
    assert d % 2 == 0, "paired layout needs even depth"
    x = xf.reshape(n_volumes * (d // 2), 2, h2, w2, c4)
    x = x.transpose(0, 2, 3, 1, 4)
    return x.reshape(n_volumes * (d // 2), h2, w2, 2 * c4)


def unfold_pairs(x8: jnp.ndarray, n_volumes: int = 1) -> jnp.ndarray:
    """Paired (N*D/2, H2, W2, 8C) -> folded packed (N*D, H2, W2, 4C)."""
    ndp, h2, w2, c8 = x8.shape
    x = x8.reshape(ndp, h2, w2, 2, c8 // 2)
    x = x.transpose(0, 3, 1, 2, 4)
    return x.reshape(ndp * 2, h2, w2, c8 // 2)


def pair_kernel_stride1_jnp(packed_kernel: jnp.ndarray) -> jnp.ndarray:
    """Dense pack (3, 3, 3, 4C, 4O) -> in-pair kernel (3, 3, 8C, 8O).

    Block (g_in, g_out) holds the depth tap delta = g_in - g_out of the
    packed kernel: [[kd=1, kd=0], [kd=2, kd=1]]."""
    kp = packed_kernel
    top = jnp.concatenate([kp[:, :, 1], kp[:, :, 0]], axis=-1)  # g_in = 0
    bot = jnp.concatenate([kp[:, :, 2], kp[:, :, 1]], axis=-1)  # g_in = 1
    return jnp.concatenate([top, bot], axis=-2)


def pair_kernel_stride1_bd_jnp(packed_kernel: jnp.ndarray) -> jnp.ndarray:
    """Dense pack (3, 3, 3, 4C, 4O) -> block-diagonal BOUNDARY kernel
    (3, 3, 8C, 8O) for the "bd" formulation.

    Contracts the lane-concat [prev_g1 (4C), next_g0 (4C)] operand into
    [up (4O), dn (4O)] in one full-width conv: [[kd=0, 0], [0, kd=2]].
    Half the kernel is zeros (2x the useful boundary FLOPs) but the MXU
    runs at the K=N=8C rate instead of 4C — a 2x time win wherever
    4C < 128 (the round-4 trace clocks the 4C-wide boundary convs at
    12-48 TF/s vs ~90+ for the dense 8C convs)."""
    kp = packed_kernel
    z = jnp.zeros_like(kp[:, :, 0])
    top = jnp.concatenate([kp[:, :, 0], z], axis=-1)   # prev_g1 -> up
    bot = jnp.concatenate([z, kp[:, :, 2]], axis=-1)   # next_g0 -> dn
    return jnp.concatenate([top, bot], axis=-2)


def pair_kernel_stride1_3d_jnp(packed_kernel: jnp.ndarray) -> jnp.ndarray:
    """Dense pack (3, 3, 3, 4C, 4O) -> 3-tap PAIR-row kernel
    (kp, kh, kw, 8C, 8O) for a single conv over (N, Dp, H2, W2, 8C).

    Pair tap kp=1 is the in-pair kernel (pair_kernel_stride1_jnp); kp=0
    (reads pair r-1) holds only the (g_in=1 -> g_out=0) block = depth tap
    kd=0; kp=2 (reads pair r+1) only (g_in=0 -> g_out=1) = kd=2. The other
    3/4 of each boundary tap is zeros — 2x the paired-pads FLOPs, but one
    dense K=N=8C conv with no materialised row-shifted copies."""
    kp = packed_kernel
    z = jnp.zeros_like(kp[:, :, 0])
    prev = jnp.concatenate([
        jnp.concatenate([z, z], axis=-1),               # g_in = 0: nothing
        jnp.concatenate([kp[:, :, 0], z], axis=-1),     # g_in = 1 -> g_out 0
    ], axis=-2)
    nxt = jnp.concatenate([
        jnp.concatenate([z, kp[:, :, 2]], axis=-1),     # g_in = 0 -> g_out 1
        jnp.concatenate([z, z], axis=-1),               # g_in = 1: nothing
    ], axis=-2)
    return jnp.stack([prev, pair_kernel_stride1_jnp(kp), nxt], axis=0)


def pair_kernel_stride2_jnp(packed_kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 pack (2, 2, 3, 4C, O) -> in-pair kernel (2, 2, 8C, 2O).

    For the z_stride=1 downsample consumed in the PAIRED layout: output
    depth dz reads input depths dz-1..dz+1 (kd taps 0..2), so the pair-row
    outputs (2r, 2r+1) draw from pair row r as [[kd=1, kd=0], [kd=2, kd=1]]
    — the same (g_in, g_out) tap-delta structure as the stride-1 pair
    kernel, on the 2x2 H/W taps of the strided pack."""
    kp = packed_kernel
    top = jnp.concatenate([kp[:, :, 1], kp[:, :, 0]], axis=-1)  # g_in = 0
    bot = jnp.concatenate([kp[:, :, 2], kp[:, :, 1]], axis=-1)  # g_in = 1
    return jnp.concatenate([top, bot], axis=-2)


def packed_conv3d_stride2_paired(x8: jnp.ndarray, packed_kernel, bias=None,
                                 n_volumes: int = 1,
                                 z_stride: int = 1) -> jnp.ndarray:
    """packed_conv3d_stride2 consumed directly in the PAIRED layout.

    x8: (N*Dp, H2, W2, 8C); packed_kernel: (2, 2, 3, 4C, O) from
    pack_kernel_stride2_jnp. Bit-identical function to
    packed_conv3d_stride2_folded on the unfold_pairs view — without ever
    materialising the unfold (the round-4 eval trace pays ~2.2 ms/window
    of pad+relayout copies for it at the L0->L1 crossing), and with the
    in-pair taps contracted at the full K=8C MXU width.

    z_stride=1: returns PAIR-LANE unpacked (N*Dp, H2, W2, 2O), lane
    g*O + o (g-major, the fold_pairs convention) — out depths (2r, 2r+1)
    live in pair row r. Convert with unfold_pair_lanes /
    pack_folded_from_pairs.
    z_stride=2: the depth window of output dz IS pair row dz (+ one
    boundary tap), so the result is already folded unpacked
    (N*Dp, H2, W2, O) at the halved depth.
    """
    assert packed_kernel.shape[2] == 3, "paired s2 path expects kd == 3"
    kp = packed_kernel.astype(x8.dtype)
    ndp, h2, w2, c8 = x8.shape
    c4 = c8 // 2
    dp = ndp // n_volumes

    def conv2d_s2(x, k):
        # output on the packed (coarse) grid: stride 1, asymmetric (1, 0)
        # pads (see packed_conv3d_stride2_folded)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # boundary tap: out depth 2r (z1) / dz (z2) reads depth 2r-1 = pair
    # r-1, g=1 via kd tap 0. 4D slices when single-volume (the 5D reshape
    # would alias — see packed_conv3d_stride1_paired).
    if n_volumes == 1:
        prev_g1 = jnp.pad(x8[:-1, :, :, c4:],
                          ((1, 0), (0, 0), (0, 0), (0, 0)))
    else:
        x5 = x8.reshape(n_volumes, dp, h2, w2, c8)
        prev_g1 = jnp.pad(x5[:, :-1, :, :, c4:],
                          ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
                          ).reshape(ndp, h2, w2, c4)
    if z_stride == 2:
        # out[dz] = kd0*in[2dz-1] + kd1*in[2dz] + kd2*in[2dz+1]
        #         = kd0*pair[dz-1].g1 + [kd1, kd2] . pair[dz]
        y = conv2d_s2(x8, jnp.concatenate([kp[:, :, 1], kp[:, :, 2]],
                                          axis=-2))
        y = y + conv2d_s2(prev_g1, kp[:, :, 0])
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    assert z_stride == 1, "paired s2 supports z_stride in (1, 2)"
    if n_volumes == 1:
        next_g0 = jnp.pad(x8[1:, :, :, :c4],
                          ((0, 1), (0, 0), (0, 0), (0, 0)))
    else:
        next_g0 = jnp.pad(x5[:, 1:, :, :, :c4],
                          ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))
                          ).reshape(ndp, h2, w2, c4)
    y = conv2d_s2(x8, pair_kernel_stride2_jnp(kp))
    up = conv2d_s2(prev_g1, kp[:, :, 0])     # -> out depth 2r   (g_out=0)
    dn = conv2d_s2(next_g0, kp[:, :, 2])     # -> out depth 2r+1 (g_out=1)
    y = y + jnp.concatenate([up, dn], axis=-1)
    if bias is not None:
        b = bias.astype(y.dtype)
        y = y + jnp.concatenate([b, b])
    return y


def instance_norm_pairs(xq: jnp.ndarray, n_volumes: int = 1,
                        eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm on PAIR-LANE unpacked (N*Dp, H, W, 2O), lane g*O + o.

    Stats per (volume, channel o) pooling the two pair groups — identical
    to instance_norm_folded on the unfold_pair_lanes view."""
    ndp, h, w, c2 = xq.shape
    o = c2 // 2
    dp = ndp // n_volumes
    return _lane_norm(
        xq, n_volumes,
        pool=lambda s: s.reshape(-1, 2, o).sum(1),
        tile=lambda m: jnp.tile(m, (1, 2)),
        count=2 * dp * h * w, eps=eps)


def unfold_pair_lanes(xq: jnp.ndarray, n_volumes: int = 1) -> jnp.ndarray:
    """Pair-lane unpacked (N*Dp, H, W, 2O) -> folded unpacked
    (N*D, H, W, O). The unpacked-channel analogue of unfold_pairs."""
    ndp, h, w, c2 = xq.shape
    o = c2 // 2
    x = xq.reshape(ndp, h, w, 2, o)
    x = x.transpose(0, 3, 1, 2, 4)
    return x.reshape(ndp * 2, h, w, o)


# How the pair-lane -> folded-packed relayout lowers (trace-time):
# "fused" = one 8D transpose (XLA stages it as TWO copies, 1.74 ms/window
# on the round-4 trace at the L0->L1 crossing); "2step" = explicit
# unfold_pair_lanes + pack_folded (two cheaper transposes).
PAIRS_PACK = os.environ.get("LINTRANSUNET_PAIRS_PACK", "fused")


def pack_folded_from_pairs(xq: jnp.ndarray, n_volumes: int = 1
                           ) -> jnp.ndarray:
    """Pair-lane unpacked (N*Dp, H, W, 2O) -> folded PACKED
    (N*2Dp, H/2, W/2, 4O) in ONE transpose.

    == pack_folded(unfold_pair_lanes(xq, n)) with the two transposes
    merged (rows stay volume-major: (n, r, g) -> n*(2r+g))."""
    if PAIRS_PACK == "2step":
        return pack_folded(unfold_pair_lanes(xq, n_volumes))
    ndp, h, w, c2 = xq.shape
    o = c2 // 2
    dp = ndp // n_volumes
    x8 = xq.reshape(n_volumes, dp, h // 2, 2, w // 2, 2, 2, o)
    # (n, r, h2, a, w2, b, g, o) -> (n, r, g, h2, w2, o, a, b)
    x8 = x8.transpose(0, 1, 6, 2, 4, 7, 3, 5)
    return x8.reshape(n_volumes * 2 * dp, h // 2, w // 2, 4 * o)


# How the paired stride-1 conv handles its two cross-pair boundary taps
# (trace-time): "pads" materialises per-volume row-shifted half-lane copies
# and runs them as 4C-wide 2D convs (~0.8 ms/window per pad fusion on the
# eval trace); "3d" folds the boundary taps into one zero-blocked
# (3, 3, 3, 8C, 8O) conv over (N, Dp, H2, W2, 8C) — 2x the in-pair FLOPs
# at the full K=N=8C rate, zero copies (REFUTED round 4: -5%, the 5D conv
# lowers worse than the 2D pair); "bd" keeps the pads operands but runs
# BOTH boundary taps as one block-diagonal K=N=8C conv (same bytes as
# pads, boundary convs at full MXU width); "ext" goes one further and
# lane-concats [x8, prev_g1, next_g0] into a 16C operand for a SINGLE
# K=16C conv (one stat-fusable output pass, but re-materialises x8's
# lanes). Frozen at import (trace-time flag).
PAIRED_S1_FORMULATION = os.environ.get("LINTRANSUNET_PAIRED_S1", "pads")


def packed_conv3d_stride1_paired(x8: jnp.ndarray, packed_kernel, bias=None,
                                 n_volumes: int = 1,
                                 formulation: str = None) -> jnp.ndarray:
    """packed_conv3d_stride1 on the PAIRED layout.

    x8: (N*Dp, H2, W2, 8C); packed_kernel: (3, 3, 3, 4C, 4O) from
    pack_kernel_stride1_jnp (the standard dense pack — the paired split is
    derived from it here). Bit-identical function to
    packed_conv3d_stride1_folded on the unfold_pairs view.
    """
    formulation = formulation or PAIRED_S1_FORMULATION
    if formulation == "3d":
        kp = packed_kernel.astype(x8.dtype)
        ndp, h2, w2, c8 = x8.shape
        dp = ndp // n_volumes
        x5 = x8.reshape(n_volumes, dp, h2, w2, c8)
        y = jax.lax.conv_general_dilated(
            x5, pair_kernel_stride1_3d_jnp(kp), (1, 1, 1),
            [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = y.reshape(ndp, h2, w2, y.shape[-1])
        if bias is not None:
            b4 = bias.astype(y.dtype)
            y = y + jnp.concatenate([b4, b4], axis=-1)
        return y
    assert packed_kernel.shape[2] == 3, "paired path expects kd == 3"
    kp = packed_kernel.astype(x8.dtype)
    ndp, h2, w2, c8 = x8.shape
    c4 = c8 // 2
    dp = ndp // n_volumes
    o4 = kp.shape[-1]

    def conv2d(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # boundary taps: g_out=0 reads g=1 of pair r-1 (depth tap kd=0);
    # g_out=1 reads g=0 of pair r+1 (depth tap kd=2). Row shifts are
    # per-volume zero-padded leading-dim slices; the half-lane reads are
    # contiguous (g-major).
    if n_volumes == 1:
        # Slice the 4D tensor directly (single-volume rows ARE depth pairs):
        # the 5D reshape creates a logically-distinct alias of the conv
        # operand and XLA emits a SECOND physically-identical relayout copy
        # for it next to the main conv2d's ({3,0,2,1} vs {4,1,3,2,0} — same
        # minor-to-major order; copy.1211/copy.1212 on the round-4 eval
        # trace, ~1.2 ms each at L0).
        prev_g1 = jnp.pad(x8[:-1, :, :, c4:],
                          ((1, 0), (0, 0), (0, 0), (0, 0)))
        next_g0 = jnp.pad(x8[1:, :, :, :c4],
                          ((0, 1), (0, 0), (0, 0), (0, 0)))
    else:
        x5 = x8.reshape(n_volumes, dp, h2, w2, c8)
        prev_g1 = jnp.pad(x5[:, :-1, :, :, c4:],
                          ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
                          ).reshape(ndp, h2, w2, c4)
        next_g0 = jnp.pad(x5[:, 1:, :, :, :c4],
                          ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))
                          ).reshape(ndp, h2, w2, c4)

    if formulation == "ext":
        # one K=16C conv: [x8 | prev_g1 | next_g0] against the stacked
        # [pair-kernel; block-diag boundary kernel]
        x_ext = jnp.concatenate([x8, prev_g1, next_g0], axis=-1)
        k_ext = jnp.concatenate(
            [pair_kernel_stride1_jnp(kp), pair_kernel_stride1_bd_jnp(kp)],
            axis=-2)
        y = conv2d(x_ext, k_ext)
    else:
        # in-pair: one dense K=N=8C conv (2 of 3 depth taps per output)
        y = conv2d(x8, pair_kernel_stride1_jnp(kp))
        if formulation == "bd":
            bd_in = jnp.concatenate([prev_g1, next_g0], axis=-1)
            y = y + conv2d(bd_in, pair_kernel_stride1_bd_jnp(kp))
        else:  # "pads"
            up = conv2d(prev_g1, kp[:, :, 0])
            dn = conv2d(next_g0, kp[:, :, 2])
            y = y + jnp.concatenate([up, dn], axis=-1)
    if bias is not None:
        b4 = bias.astype(y.dtype)
        y = y + jnp.concatenate([b4, b4], axis=-1)
    return y


def packed_conv3d_stride1_sheared_paired(x8: jnp.ndarray, sheared_kernel,
                                         bias=None,
                                         n_volumes: int = 1) -> jnp.ndarray:
    """The sheared transform on the PAIRED layout — both levers at once.

    The shear acts purely on the H/W block taps (2x2 taps + realign,
    16/9x of the ORIGINAL FLOPs) while pairing acts on depth parity
    (K=N=8C contraction), so they compose: the in-pair kernel stacks the
    sheared depth-tap slices exactly as pair_kernel_stride1_jnp stacks the
    dense ones ([[kd1, kd0], [kd2, kd1]]), the two boundary depth taps run
    sheared at 4C on the row-shifted halves, and ONE realign pass serves
    all three contributions (the (alpha, beta) output shift is the same
    lane/space selection for every depth tap, so it commutes with their
    sum). ~2/3 of the FLOPs run at the K=N=128 MXU width, total inflation
    16/9x vs the paired-dense 4x. Bit-identical function to
    packed_conv3d_stride1_paired with the matching dense kernel.

    x8: (N*Dp, H2, W2, 8C); sheared_kernel: (2, 2, 3, 4C, 4O) from
    pack_kernel_stride1_sheared_jnp.
    """
    sk = sheared_kernel.astype(x8.dtype)
    ndp, h2, w2, c8 = x8.shape
    c4 = c8 // 2
    dp = ndp // n_volumes
    o4 = sk.shape[-1]
    s0, s1, s2 = sk[:, :, 0], sk[:, :, 1], sk[:, :, 2]

    # in-pair: one 2x2-block-tap conv at 8C -> 8O
    k8 = jnp.concatenate([jnp.concatenate([s1, s0], axis=-1),
                          jnp.concatenate([s2, s1], axis=-1)], axis=-2)
    xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, k8, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (ndp, h2+1, w2+1, 8O)

    # boundary depth taps across pair rows (see packed_conv3d_stride1_paired)
    x5 = x8.reshape(n_volumes, dp, h2, w2, c8)
    prev_g1 = jnp.pad(x5[:, :-1, :, :, c4:],
                      ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    next_g0 = jnp.pad(x5[:, 1:, :, :, :c4],
                      ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    up = jax.lax.conv_general_dilated(
        jnp.pad(prev_g1.reshape(ndp, h2, w2, c4),
                ((0, 0), (1, 1), (1, 1), (0, 0))),
        s0, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dn = jax.lax.conv_general_dilated(
        jnp.pad(next_g0.reshape(ndp, h2, w2, c4),
                ((0, 0), (1, 1), (1, 1), (0, 0))),
        s2, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + jnp.concatenate([up, dn], axis=-1)
    if bias is not None:
        # per-channel bias is constant across sub-positions, so it commutes
        # with the realign's sub-position selection
        b4 = bias.astype(y.dtype)
        y = y + jnp.concatenate([b4, b4], axis=-1)

    # one realign for all contributions: output group (alpha, beta) is the
    # (h2, w2) slice at (alpha, beta) x the matching sub-position lane
    yg = y.reshape(ndp, h2 + 1, w2 + 1, 2, o4 // 4, 4)
    parts = [yg[:, a:a + h2, b:b + w2, :, :, a * 2 + b]
             for a in (0, 1) for b in (0, 1)]
    out = jnp.stack(parts, axis=-1)  # (ndp, h2, w2, 2, O, 4)
    return out.reshape(ndp, h2, w2, 2 * o4)


def packed_conv1x1_paired(x8: jnp.ndarray, packed_kernel,
                          bias=None) -> jnp.ndarray:
    """Pointwise conv on the paired layout.

    packed_kernel: (1, 1, 1, 4C, 4O) from pack_kernel_1x1_jnp; the paired
    kernel is block-diagonal over g."""
    kp = packed_kernel.astype(x8.dtype)[:, :, 0]  # (1, 1, 4C, 4O)
    c4, o4 = kp.shape[-2:]
    z = jnp.zeros_like(kp)
    k8 = jnp.concatenate([jnp.concatenate([kp, z], axis=-1),
                          jnp.concatenate([z, kp], axis=-1)], axis=-2)
    y = jax.lax.conv_general_dilated(
        x8, k8, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        b4 = jnp.repeat(bias, 4).astype(y.dtype) if bias.shape[0] * 4 == o4 \
            else bias.astype(y.dtype)
        y = y + jnp.concatenate([b4, b4], axis=-1)
    return y


def group_instance_norm_paired(x8: jnp.ndarray, channels: int,
                               n_volumes: int = 1,
                               eps: float = 1e-5) -> jnp.ndarray:
    """group_instance_norm_folded on the paired layout.

    Stats per (volume, original channel) pool over (pair rows x spatial x
    g x 4 sub-positions) — identical statistics to the folded op."""
    ndp, h, w, c8 = x8.shape
    assert c8 == 8 * channels
    dp = ndp // n_volumes
    if IN_STATS == "dot":
        xr = x8.reshape(n_volumes, dp * h * w, c8)
        mean, rstd = _mxu_group_stats(
            xr, lambda s: s.reshape(n_volumes, 2, channels, 4).sum((1, 3)),
            dp * h * w * 8, eps)
        mean_l = jnp.tile(jnp.repeat(mean, 4, axis=-1),
                          (1, 2))[:, None, None, None, :]
        rstd_l = jnp.tile(jnp.repeat(rstd, 4, axis=-1),
                          (1, 2))[:, None, None, None, :]
        x32 = x8.astype(jnp.float32).reshape(n_volumes, dp, h, w, c8)
        return ((x32 - mean_l) * rstd_l).reshape(
            ndp, h, w, c8).astype(x8.dtype)
    return _lane_norm(
        x8, n_volumes,
        pool=lambda s: s.reshape(-1, 2, channels, 4).sum((1, 3)),
        tile=lambda m: jnp.tile(jnp.repeat(m, 4, axis=-1), (1, 2)),
        count=dp * h * w * 8, eps=eps)


def packed_scale_paired(x8: jnp.ndarray, gate8: jnp.ndarray,
                        channels: int) -> jnp.ndarray:
    """Multiply paired (…, 8C) features by a paired (…, 8) 1-channel gate."""
    shape = x8.shape
    g = gate8.reshape(shape[:-1] + (2, 1, 4))
    x = x8.reshape(shape[:-1] + (2, channels, 4))
    return (x * g.astype(x.dtype)).reshape(shape)


def concat_paired(a8: jnp.ndarray, b8: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat two paired tensors (lane order g*4C + c*4 + ab).

    A naive lane concat would interleave the g halves wrongly; the paired
    concat stitches per-g halves: [a_g0 | b_g0 | a_g1 | b_g1]."""
    ca, cb = a8.shape[-1] // 2, b8.shape[-1] // 2
    return jnp.concatenate(
        [a8[..., :ca], b8[..., :cb], a8[..., ca:], b8[..., cb:]], axis=-1)
