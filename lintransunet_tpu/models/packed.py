"""Packed-layout execution modules (the small-C TPU fast path).

These compute the SAME functions as the standard blocks but on a 2x2
space-to-channel packed layout (see ops/packed_conv.py for the measured
rationale: ~3x on the top UNet level). Parameter names/shapes are identical
to the standard path — kernels are stored unpacked and transformed at trace
time — so checkpoints and the torch importer work unchanged, and
``packed_levels`` can be flipped freely between training and serving.

Packing convention throughout: channel-major, packed_channel = c*4 + a*2 + b
for sub-position (a, b) == ops.patchify.windows_embedding(kernel_size=2).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lintransunet_tpu import ops
from lintransunet_tpu.ops import packed_conv as pc
from lintransunet_tpu.ops import pallas_conv as pcv

Array = jnp.ndarray

# UpBlock merge-conv execution. The trace shows the skip concat paying two
# ~1.2 ms minor-major layout copies per packed decoder level (copy.1211/1212,
# [32,128,128,256]): XLA reconciles the upsample chain's and the encoder
# skip's layouts before it can materialise the concat. "dual" computes
# conv2(concat(x, skip)) == conv2_a(x) + conv2_b(skip) instead — the same
# contraction split by input rows — so each half fuses into its producer's
# native layout and no concat is materialised. Bit-compatible up to the
# add's accumulation order. Frozen at import like the other trace-time knobs.
UPBLOCK_DUAL = __import__("os").environ.get(
    "LINTRANSUNET_UPBLOCK_DUAL", "0") == "1"

# When set (a list), every PackedConv traced appends (path, kind, raw_shape)
# with kind the kernel-transform it will apply ('dense' | 'sheared' | 's2' |
# '1x1') and raw_shape the UNpacked kernel shape — used by prepack_plan to
# enumerate the kernels prepack_params must transform (and to make re-
# prepacking an already-packed tree a safe no-op).
_PREPACK_CAPTURE = None


def prepack_plan(model, example, train: bool = False):
    """Abstract-trace ``model``; list every PackedConv as (path, kind,
    raw_shape).

    Runs under jax.eval_shape — no FLOPs, no device memory. ``example`` may
    be a jax.ShapeDtypeStruct."""
    global _PREPACK_CAPTURE
    _PREPACK_CAPTURE = []
    try:
        jax.eval_shape(
            lambda e: model.init(jax.random.PRNGKey(0), e, train=train),
            example)
    finally:
        plan, _PREPACK_CAPTURE = _PREPACK_CAPTURE, None
    return plan


def _mutable_tree(d):
    if hasattr(d, "items") and not hasattr(d, "__setitem__"):
        return {k: _mutable_tree(v) for k, v in d.items()}
    if isinstance(d, dict):
        return {k: _mutable_tree(v) for k, v in d.items()}
    return d


def prepack_params(model, params, example, plan=None):
    """Pre-transform every PackedConv kernel in ``params`` to its packed form.

    The pack transforms (pack_kernel_stride1/2/1x1) are pure functions of the
    stored kernel; running them per forward costs ~12 ms/window on the
    eval-window trace (round 3, docs/DESIGN.md §10). This applies them ONCE —
    the returned tree drives the same ``model.apply`` (PackedConv detects the
    packed shapes and skips the transform). Use for inference/serving only:
    the optimiser must keep training on raw kernels.
    """
    plan = plan if plan is not None else prepack_plan(model, example)
    packers = {
        "dense": pc.pack_kernel_stride1_jnp,
        "sheared": pc.pack_kernel_stride1_sheared_jnp,
        "s2": pc.pack_kernel_stride2_jnp,
        "1x1": pc.pack_kernel_1x1_jnp,
    }

    # one jitted call (not eager per-op dispatches — the axon tunnel costs
    # ~30 ms per host round-trip, and the pack transforms are many small ops)
    def transform(p):
        p = _mutable_tree(p)
        for path, kind, raw_shape in plan:
            node = p
            for name in path:
                node = node[name]
            # already-packed kernels (shape != raw) pass through untouched,
            # so prepacking an eval tree twice is a safe no-op
            if node["kernel"].shape == raw_shape:
                node["kernel"] = packers[kind](node["kernel"])
        return p

    return jax.jit(transform)(params)


class PackedConv(nn.Module):
    """Conv with unpacked params executed on packed activations.

    mode 's1': k=3 stride-1 conv, packed in -> packed out.
    mode 's2': k=3 stride-(2,2,z) conv, packed in -> UNPACKED out on the
               packed grid (the natural result of a stride-2 downsample).
    mode '1x1': pointwise conv, packed in -> packed out (block-diagonal).
    """

    features: int
    in_features: int
    mode: str = "s1"
    z_stride: int = 1
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xp: Array, n_volumes: Optional[int] = None,
                 paired: bool = False,
                 return_packed: bool = False) -> Array:
        """``n_volumes=None``: packed 5D layout (N, H2, W2, D, 4C).
        ``n_volumes=n``: FOLDED layout (n*D, H2, W2, 4C) — same params, the
        transpose-free ops from ops/packed_conv.py. ``paired=True`` (folded
        only): the 8C depth-pair layout (n*D/2, H2, W2, 8C); s2 convs must
        take the folded layout (the strided output leaves the pair grid).
        ``return_packed=True`` (s1 only): return (dense_packed_kernel,
        packed_bias) instead of applying — the fused canvas path
        (ops/pallas_conv.py) orchestrates the conv chain itself."""
        use_sheared = (
            self.mode == "s1" and n_volumes is not None
            and pc.resolve_s1_formulation(4 * self.in_features) == "sheared")
        kind = ("s2" if self.mode == "s2" else "1x1" if self.mode == "1x1"
                else "sheared" if use_sheared else "dense")
        k = 1 if self.mode == "1x1" else self.kernel_size
        if _PREPACK_CAPTURE is not None:
            raw_shape = (k, k, k, self.in_features, self.features)
            _PREPACK_CAPTURE.append((self.scope.path, kind, raw_shape))
        if self.is_initializing() or not self.has_variable("params", "kernel"):
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (k, k, k, self.in_features, self.features), jnp.float32)
        else:
            # raw accessor: prepack_params stores the PACKED kernel under the
            # same name (different shape), which nn.param would reject
            kernel = self.get_variable("params", "kernel")
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # pre-packed detection by shape (prepack_params): raw s1/1x1 kernels
        # have shape (k,k,k,C,O); dense-packed (3,3,3,4C,4O); sheared
        # (2,2,3,4C,4O); s2 packed (2,2,kd,4C,O).
        pre_dense = kernel.shape[3] == 4 * self.in_features and kernel.shape[0] != 2
        pre_sheared = self.mode != "s2" and kernel.shape[0] == 2
        assert not (paired and n_volumes is None), \
            "paired layout requires the folded regime"
        if return_packed:
            assert self.mode == "s1" and not (use_sheared or pre_sheared), \
                "return_packed serves the dense s1 canvas path only"
            kp = kernel if pre_dense else pc.pack_kernel_stride1_jnp(kernel)
            return kp, pc.pack_bias_jnp(bias)
        if self.mode == "s1":
            bp = pc.pack_bias_jnp(bias)
            if n_volumes is not None:
                if use_sheared or pre_sheared:
                    assert pre_sheared or not pre_dense, (
                        "sheared formulation requested but kernel was "
                        "pre-packed dense — rerun prepack_params under the "
                        "same LINTRANSUNET_FOLDED_S1 setting")
                    ks = (kernel if pre_sheared
                          else pc.pack_kernel_stride1_sheared_jnp(kernel))
                    if paired:
                        return pc.packed_conv3d_stride1_sheared_paired(
                            xp, ks.astype(xp.dtype), bp.astype(xp.dtype),
                            n_volumes=n_volumes)
                    return pc.packed_conv3d_stride1_sheared_folded(
                        xp, ks.astype(xp.dtype), bp.astype(xp.dtype),
                        n_volumes=n_volumes)
                kp = kernel if pre_dense else pc.pack_kernel_stride1_jnp(kernel)
                if paired:
                    return pc.packed_conv3d_stride1_paired(
                        xp, kp.astype(xp.dtype), bp.astype(xp.dtype),
                        n_volumes=n_volumes)
                return pc.packed_conv3d_stride1_folded(
                    xp, kp.astype(xp.dtype), bp.astype(xp.dtype),
                    n_volumes=n_volumes,
                    formulation=pc.resolve_s1_formulation(
                        4 * self.in_features))
            kp = kernel if pre_dense else pc.pack_kernel_stride1_jnp(kernel)
            return pc.packed_conv3d_stride1(
                xp, kp.astype(xp.dtype), bp.astype(xp.dtype),
                kd_pad=self.kernel_size // 2)
        if self.mode == "s2":
            kp = (kernel if kernel.shape[0] == 2
                  else pc.pack_kernel_stride2_jnp(kernel))
            if paired:
                # consumed in the pair layout: z_stride=1 returns PAIR-LANE
                # (N*Dp, H2, W2, 2O); z_stride=2 returns folded unpacked
                return pc.packed_conv3d_stride2_paired(
                    xp, kp.astype(xp.dtype), bias.astype(xp.dtype),
                    n_volumes=n_volumes, z_stride=self.z_stride)
            if n_volumes is not None:
                return pc.packed_conv3d_stride2_folded(
                    xp, kp.astype(xp.dtype), bias.astype(xp.dtype),
                    n_volumes=n_volumes, z_stride=self.z_stride,
                    kd_pad=self.kernel_size // 2)
            return pc.packed_conv3d_stride2(
                xp, kp.astype(xp.dtype), bias.astype(xp.dtype),
                z_stride=self.z_stride, kd_pad=self.kernel_size // 2)
        kp = kernel if pre_dense else pc.pack_kernel_1x1_jnp(kernel)
        bp = pc.pack_bias_jnp(bias)
        if paired:
            return pc.packed_conv1x1_paired(xp, kp.astype(xp.dtype),
                                            bp.astype(xp.dtype))
        if n_volumes is not None:
            return pc.packed_conv1x1_folded(xp, kp.astype(xp.dtype),
                                            bp.astype(xp.dtype))
        return ops.conv3d(xp, kp.astype(xp.dtype), bp.astype(xp.dtype),
                          stride=1, padding=0)


class PackedDownBlock(nn.Module):
    """DownBlock on packed activations (Unet_3Dblock.py:290-341 semantics).

    Input: packed (N, H/2, W/2, D, 4C). Returns (down, skip_packed) where
    ``down`` is UNPACKED (stride-2 output on the packed grid) and the skip
    stays packed for the packed decoder level.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    z_stride: int = 1
    dropout: Optional[float] = None
    is_res: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xp: Array, train: bool = False,
                 n_volumes: Optional[int] = None, paired: bool = False):
        fmode = (pcv.fused_s1_mode(train, n_volumes, xp.shape[-1],
                                   paired=paired)
                 if self.kernel_size == 3 else None)
        hbo = None
        if fmode is False:
            hbo = pcv.pick_hbo_vmem(
                xp.shape[1], xp.shape[2],
                [dict(la=xp.shape[-1], no=xp.shape[-1], paired=paired)])
            if hbo is None:
                fmode = None
        if fmode is not None:
            # fused canvas unit: conv1 runs as ONE Mosaic pass with the IN
            # stat partials in its epilogue; the normalize+act applies as
            # an XLA affine (no separate stat-reduce pass)
            kp1, bp1 = PackedConv(
                self.in_channels, self.in_channels, mode="s1",
                kernel_size=self.kernel_size, dtype=self.dtype,
                name="conv1")(xp, n_volumes=n_volumes, paired=paired,
                              return_packed=True)
            h2, w2 = xp.shape[1], xp.shape[2]
            dpv = xp.shape[0] // n_volumes
            bias_l = jnp.concatenate([bp1, bp1]) if paired else bp1
            y1c, st = pcv.fused_s1_canvas(
                pcv.to_canvas(xp, n_volumes, hbo=hbo), kp1.astype(xp.dtype),
                bias=bias_l, n_volumes=n_volumes, h=h2, w=w2,
                mode="paired" if paired else "folded", want_stats=True,
                hbo=hbo, interpret=fmode)
            count = dpv * h2 * w2 * (8 if paired else 4)
            sc, sh = pcv.stats_to_affine(st, self.in_channels, count,
                                         paired=paired)
            y = pcv.apply_affine_leaky(
                pcv.from_canvas(y1c, h2, w2, n_volumes), sc, sh, n_volumes)
        else:
            y = PackedConv(self.in_channels, self.in_channels, mode="s1",
                           kernel_size=self.kernel_size, dtype=self.dtype,
                           name="conv1")(xp, n_volumes=n_volumes,
                                         paired=paired)
            if paired:
                y = ops.leaky_relu(pc.group_instance_norm_paired(
                    y, self.in_channels, n_volumes=n_volumes))
            elif n_volumes is not None:
                y = ops.leaky_relu(pc.group_instance_norm_folded(
                    y, self.in_channels, n_volumes=n_volumes))
            else:
                y = ops.leaky_relu(
                    pc.group_instance_norm_packed(y, self.in_channels))
        if self.is_res:
            y = y + xp
        s2_paired = paired and pc.S2_PAIRED
        # without the paired s2 path the strided downsample runs on the
        # folded layout (unfold_pairs materialises pad+relayout copies)
        y_s2 = pc.unfold_pairs(y, n_volumes) if paired and not s2_paired \
            else y
        z = PackedConv(self.out_channels, self.in_channels, mode="s2",
                       z_stride=self.z_stride,
                       kernel_size=self.kernel_size, dtype=self.dtype,
                       name="conv2")(y_s2, n_volumes=n_volumes,
                                     paired=s2_paired)
        if s2_paired and self.z_stride == 1:
            # z is PAIR-LANE (N*Dp, H2, W2, 2O); the caller converts with
            # pack_folded_from_pairs / unfold_pair_lanes
            z = ops.leaky_relu(pc.instance_norm_pairs(
                z, n_volumes=n_volumes))
        elif n_volumes is not None:
            z = ops.leaky_relu(pc.instance_norm_folded(z, n_volumes=n_volumes))
        else:
            z = ops.leaky_relu(ops.instance_norm(z))
        if self.dropout is not None:
            z = nn.Dropout(self.dropout)(z, deterministic=not train)
        return z, y


class PackedUpBlock(nn.Module):
    """UpBlock on packed activations (Unet_3Dblock.py:504-557 semantics).

    Channel-major packing makes the skip concat a plain channel concat:
    packed([x, skip]) == concat(packed(x), packed(skip)).
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xp: Array, skip_p: Array, train: bool = False,
                 n_volumes: Optional[int] = None,
                 paired: bool = False) -> Array:
        def norm(t):
            if paired:
                return pc.group_instance_norm_paired(
                    t, self.out_channels, n_volumes=n_volumes)
            if n_volumes is not None:
                return pc.group_instance_norm_folded(
                    t, self.out_channels, n_volumes=n_volumes)
            return pc.group_instance_norm_packed(t, self.out_channels)

        no_l = 4 * self.out_channels * (2 if paired else 1)
        fmode = (pcv.fused_s1_mode(train, n_volumes, xp.shape[-1],
                                   skip_p.shape[-1], no_l, paired=paired)
                 if self.kernel_size == 3 else None)
        hbo = None
        if fmode is False:
            # one hbo for the whole chain: conv2 consumes conv1's canvas,
            # so both calls (and both to_canvas pads) must agree on Hc
            hbo = pcv.pick_hbo_vmem(
                xp.shape[1], xp.shape[2],
                [dict(la=xp.shape[-1], no=no_l, paired=paired),
                 dict(la=no_l, no=no_l, lb=skip_p.shape[-1], paired=paired,
                      affine_a=True)])
            if hbo is None:
                fmode = None
        if fmode is not None:
            # fused canvas chain: conv1's IN+act rides conv2's prologue,
            # and conv2 runs DUAL-input (y1, skip) — the skip concat (and
            # its minor-major copies) never materialises
            kp1, bp1 = PackedConv(
                self.out_channels, self.in_channels, mode="s1",
                kernel_size=self.kernel_size, dtype=self.dtype,
                name="conv1")(xp, n_volumes=n_volumes, paired=paired,
                              return_packed=True)
            kp2, bp2 = PackedConv(
                self.out_channels, 2 * self.out_channels, mode="s1",
                kernel_size=self.kernel_size, dtype=self.dtype,
                name="conv2")(xp, n_volumes=n_volumes, paired=paired,
                              return_packed=True)
            h2, w2 = xp.shape[1], xp.shape[2]
            dpv = xp.shape[0] // n_volumes
            mode = "paired" if paired else "folded"
            count = dpv * h2 * w2 * (8 if paired else 4)

            def lanes(b4):
                return jnp.concatenate([b4, b4]) if paired else b4

            y1c, st1 = pcv.fused_s1_canvas(
                pcv.to_canvas(xp, n_volumes, hbo=hbo), kp1.astype(xp.dtype),
                bias=lanes(bp1), n_volumes=n_volumes, h=h2, w=w2,
                mode=mode, want_stats=True, hbo=hbo, interpret=fmode)
            sc1, sh1 = pcv.stats_to_affine(st1, self.out_channels, count,
                                           paired=paired)
            half = kp2.shape[3] // 2  # split the concat kernel by input rows
            y2c, st2 = pcv.fused_s1_canvas(
                y1c, kp2[:, :, :, :half].astype(xp.dtype),
                xb=pcv.to_canvas(skip_p, n_volumes, hbo=hbo),
                packed_kernel_b=kp2[:, :, :, half:].astype(xp.dtype),
                bias=lanes(bp2),
                affine_a=jnp.stack([sc1, sh1], axis=1),
                n_volumes=n_volumes, h=h2, w=w2, mode=mode,
                want_stats=True, hbo=hbo, interpret=fmode)
            sc2, sh2 = pcv.stats_to_affine(st2, self.out_channels, count,
                                           paired=paired)
            x = pcv.apply_affine_leaky(
                pcv.from_canvas(y2c, h2, w2, n_volumes), sc2, sh2,
                n_volumes)
        else:
            x = PackedConv(self.out_channels, self.in_channels, mode="s1",
                           kernel_size=self.kernel_size, dtype=self.dtype,
                           name="conv1")(xp, n_volumes=n_volumes,
                                         paired=paired)
            x = ops.leaky_relu(norm(x))
            if (UPBLOCK_DUAL and self.kernel_size == 3
                    and n_volumes is not None):
                kp2, bp2 = PackedConv(
                    self.out_channels, 2 * self.out_channels, mode="s1",
                    kernel_size=self.kernel_size, dtype=self.dtype,
                    name="conv2")(x, n_volumes=n_volumes, paired=paired,
                                  return_packed=True)
                half = kp2.shape[3] // 2  # input rows: [x rows; skip rows]
                conv = (pc.packed_conv3d_stride1_paired if paired
                        else pc.packed_conv3d_stride1_folded)
                x = (conv(x, kp2[:, :, :, :half].astype(x.dtype),
                          bp2.astype(x.dtype), n_volumes=n_volumes)
                     + conv(skip_p, kp2[:, :, :, half:].astype(x.dtype),
                            None, n_volumes=n_volumes))
            else:
                x = (pc.concat_paired(x, skip_p) if paired
                     else jnp.concatenate([x, skip_p], axis=-1))
                x = PackedConv(self.out_channels, 2 * self.out_channels,
                               mode="s1", kernel_size=self.kernel_size,
                               dtype=self.dtype, name="conv2")(
                                   x, n_volumes=n_volumes, paired=paired)
            x = ops.leaky_relu(norm(x))
        if self.dropout is not None:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class PackedSpatialAttentionGate(nn.Module):
    """Additive attention gate on packed activations
    (Unet_3Dblock.py:194-221 semantics). Returns a packed (…, 4) gate map."""

    in_channel1: int
    in_channel2: int
    inter_channel: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, skip_p: Array, up_p: Array,
                 n_volumes: Optional[int] = None,
                 paired: bool = False) -> Array:
        def norm(t):
            if paired:
                return pc.group_instance_norm_paired(
                    t, self.inter_channel, n_volumes=n_volumes)
            if n_volumes is not None:
                return pc.group_instance_norm_folded(
                    t, self.inter_channel, n_volumes=n_volumes)
            return pc.group_instance_norm_packed(t, self.inter_channel)

        xs = PackedConv(self.inter_channel, self.in_channel1, mode="1x1",
                        dtype=self.dtype, name="W_x_0")(
                            skip_p, n_volumes=n_volumes, paired=paired)
        xs = norm(xs)
        gs = PackedConv(self.inter_channel, self.in_channel2, mode="1x1",
                        dtype=self.dtype, name="W_g_0")(
                            up_p, n_volumes=n_volumes, paired=paired)
        gs = norm(gs)
        a = nn.relu(xs + gs)
        a = PackedConv(1, self.inter_channel, mode="1x1", dtype=self.dtype,
                       name="psi_0")(a, n_volumes=n_volumes, paired=paired)
        return nn.sigmoid(a)


def pack(x: Array) -> Array:
    """(N, H, W, D, C) -> packed (N, H/2, W/2, D, 4C)."""
    return ops.windows_embedding(x, 2)


def unpack(xp: Array) -> Array:
    """Inverse of pack."""
    return ops.windows_unembedding(xp, 2)
