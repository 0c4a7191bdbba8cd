"""Encoder / decoders for the LinTransUNet family (channels-last flax).

Mirrors ``model/Unet_3Dblock.py``'s Encoder (:560-607), Decoder (:610-644),
ROIDecoder (:1277-1396) and MaskDecoder (:1399-1424). The anisotropic
depth schedule is preserved exactly: encoder block i (1-based) strides
``(2, 2, (i-1)%2 + 1)``; the decoder mirrors it with alternating
``(2,2,2)`` / ``(2,2,1)`` trilinear upsamples.
"""

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lintransunet_tpu import ops
from lintransunet_tpu.models import packed as pk
from lintransunet_tpu.models.blocks import DownBlock, SpatialAttentionGate, UpBlock, _conv
from lintransunet_tpu.models.bridges import ConnectBridge, InitialBridge, ROIBridge
from lintransunet_tpu.ops import packed_conv as pc
from lintransunet_tpu.ops import pallas_conv as pcv

Array = jnp.ndarray


def encoder_stride(i: int) -> Tuple[int, int, int]:
    """Depth stride schedule of encoder block i (1-based), Unet_3Dblock.py:584."""
    return (2, 2, (i - 1) % 2 + 1)


# Widest 4C lane width that still runs PAIRED. 64 pairs only levels below
# the MXU's K=128 (the original motivation: fill the contraction dim).
# The round-3 chain bench measured pairing ALSO winning at 4C=128
# (L1 3-conv chain 3.99 vs 4.97 ms, 8C=256 — the gain there is halved rows
# / fewer boundary taps, not K width), so the cap is tunable for the
# full-bench A/B.
PAIRED_MAX_4C = int(os.environ.get("LINTRANSUNET_PAIRED_MAX4C", "64"))


def _use_paired(paired_flag: bool, folded: bool, channels: int,
                depth: int) -> bool:
    """A packed level runs in the PAIRED (8C) layout iff its 4C lane width
    is at most PAIRED_MAX_4C and its depth is even (fold_pairs stacks depth
    parity into lanes, packed_conv.py). Odd-depth levels fall back to the
    folded path instead of tripping fold_pairs' assert. Must be applied
    identically on the encoder and decoder sides so skips arrive in the
    layout the decoder level expects — both sides see the same per-level
    depths, so gating on the in-hand depth is consistent."""
    return (paired_flag and folded and 4 * channels <= PAIRED_MAX_4C
            and depth % 2 == 0)


def decoder_scale(n_levels: int, i: int) -> Tuple[int, int, int]:
    """Upsample factor at decoder step i (1-based), Unet_3Dblock.py:1375-1378."""
    return (2, 2, 2) if (n_levels - i) % 2 == 0 else (2, 2, 1)


class Encoder(nn.Module):
    """2x2 window-embed -> input conv -> 4 anisotropic DownBlocks.

    Returns (bottleneck, [skip_0..skip_{L-2}]) where skip_i is the
    pre-downsample feature of block i+1 (channels num_layers[i]).
    """

    num_layers: Sequence[int]
    dim_input: int
    kernel_size: int = 3
    dropout: Optional[float] = None
    emb_window: int = 2
    packed_levels: int = 0
    folded: Optional[bool] = None
    paired: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        n_blocks = len(self.num_layers) - 1
        hw_div = self.emb_window * 2 ** n_blocks
        d_div = 2 ** sum(encoder_stride(i)[2] == 2 for i in range(1, n_blocks + 1))
        n, h, w, d, _ = x.shape
        if h % hw_div or w % hw_div or d % d_div:
            raise ValueError(
                f"input spatial dims (H={h}, W={w}, D={d}) must be divisible "
                f"by ({hw_div}, {hw_div}, {d_div}) for {n_blocks} encoder "
                f"levels with window embedding {self.emb_window}")
        folded = (pc.FOLDED_LAYOUT_DEFAULT if self.folded is None
                  else self.folded)
        paired_flag = (pc.PAIRED_LAYOUT_DEFAULT if self.paired is None
                       else self.paired)
        nv = n if folded else None
        x = ops.windows_embedding(x, self.emb_window)
        skips = []
        p_levels = min(self.packed_levels, n_blocks - 1)
        if p_levels > 0:
            # packed fast path for the top level(s) (ops/packed_conv.py):
            # identical math, kernels transformed at trace time; skips of
            # packed levels stay packed for the packed decoder levels.
            # In the folded regime the ONE real transpose of the whole
            # packed region happens here, on the thinnest tensor.
            cur_d = x.shape[3]  # windows_embedding leaves depth untouched
            p0 = _use_paired(paired_flag, folded, self.num_layers[0], cur_d)
            if folded:
                xp = pc.pack_folded(pc.fold_depth(x))
                if p0:
                    xp = pc.fold_pairs(xp, n)
            else:
                xp = pk.pack(x)
            fmode = (pcv.fused_s1_mode(train, nv, xp.shape[-1],
                                       paired=p0)
                     if self.kernel_size == 3 else None)
            hbo0 = None
            if fmode is False:
                hbo0 = pcv.pick_hbo_vmem(
                    xp.shape[1], xp.shape[2],
                    [dict(la=xp.shape[-1],
                          no=4 * self.num_layers[0] * (2 if p0 else 1),
                          paired=p0)])
                if hbo0 is None:
                    fmode = None
            if fmode is not None:
                kp0, bp0 = pk.PackedConv(
                    self.num_layers[0],
                    self.dim_input * self.emb_window ** 2,
                    mode="s1", kernel_size=self.kernel_size,
                    dtype=self.dtype, name="input_block")(
                        xp, n_volumes=nv, paired=p0, return_packed=True)
                h2, w2 = xp.shape[1], xp.shape[2]
                dpv = xp.shape[0] // n
                yc, st = pcv.fused_s1_canvas(
                    pcv.to_canvas(xp, n, hbo=hbo0), kp0.astype(xp.dtype),
                    bias=jnp.concatenate([bp0, bp0]) if p0 else bp0,
                    n_volumes=n, h=h2, w=w2,
                    mode="paired" if p0 else "folded", want_stats=True,
                    hbo=hbo0, interpret=fmode)
                sc, sh = pcv.stats_to_affine(
                    st, self.num_layers[0], dpv * h2 * w2 * (8 if p0 else 4),
                    paired=p0)
                xp = pcv.apply_affine_leaky(
                    pcv.from_canvas(yc, h2, w2, n), sc, sh, n)
            else:
                xp = pk.PackedConv(self.num_layers[0],
                                   self.dim_input * self.emb_window ** 2,
                                   mode="s1", kernel_size=self.kernel_size,
                                   dtype=self.dtype, name="input_block")(
                                       xp, n_volumes=nv, paired=p0)
                if p0:
                    xp = ops.leaky_relu(pc.group_instance_norm_paired(
                        xp, self.num_layers[0], n_volumes=n))
                elif folded:
                    xp = ops.leaky_relu(pc.group_instance_norm_folded(
                        xp, self.num_layers[0], n_volumes=n))
                else:
                    xp = ops.leaky_relu(
                        pc.group_instance_norm_packed(xp, self.num_layers[0]))
        else:
            x = _conv(self.num_layers[0], self.kernel_size,
                      padding=self.kernel_size // 2, dtype=self.dtype,
                      name="input_block")(x)
            x = ops.leaky_relu(ops.instance_norm(x))

        for i in range(1, len(self.num_layers)):
            if i <= p_levels:
                blk_paired = _use_paired(paired_flag, folded,
                                         self.num_layers[i - 1], cur_d)
                x, skip_p = pk.PackedDownBlock(
                    in_channels=self.num_layers[i - 1],
                    out_channels=self.num_layers[i],
                    kernel_size=self.kernel_size,
                    z_stride=encoder_stride(i)[2],
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"block_list_{i - 1}")(
                        xp, train=train, n_volumes=nv, paired=blk_paired)
                skips.append(skip_p)
                # a paired block's z1 downsample returns PAIR-LANE rows
                # (packed_conv3d_stride2_paired); z2 output is folded
                pair_lane = (blk_paired and pc.S2_PAIRED
                             and encoder_stride(i)[2] == 1)
                cur_d //= encoder_stride(i)[2]
                if i < p_levels:
                    if pair_lane:
                        xp = pc.pack_folded_from_pairs(x, n)
                    else:
                        xp = pc.pack_folded(x) if folded else pk.pack(x)
                    if _use_paired(paired_flag, folded, self.num_layers[i],
                                   cur_d):
                        xp = pc.fold_pairs(xp, n)
                elif folded:
                    # crossing into the unpacked levels: unfold once
                    if pair_lane:
                        x = pc.unfold_pair_lanes(x, n)
                    x = pc.unfold_depth(x, n)
            else:
                x, skip = DownBlock(
                    in_channels=self.num_layers[i - 1],
                    out_channels=self.num_layers[i],
                    kernel_size=self.kernel_size,
                    stride=encoder_stride(i),
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"block_list_{i - 1}")(x, train=train)
                skips.append(skip)
        return x, skips


class Decoder(nn.Module):
    """Plain mirror decoder + final conv + channel softmax.

    The reference Decoder (Unet_3Dblock.py:610-644) never upsamples inside
    UpBlock, which makes its skip concat shape-inconsistent (the
    Tradition/Bottle/Skip variants cannot actually run there). Fixed-and-
    flagged deviation: a trilinear upsample mirroring the encoder stride
    schedule is inserted before each UpBlock, plus the window unembedding so
    outputs return to full resolution.
    """

    num_layers: Sequence[int]
    dim_output: int
    kernel_size: int = 3
    dropout: Optional[float] = None
    emb_window: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, encoded_list, train: bool = False) -> Array:
        n_levels = len(self.num_layers)
        for i in range(1, n_levels):
            x = ops.resize_linear_align_corners(x, decoder_scale(n_levels, i))
            x = UpBlock(
                in_channels=self.num_layers[n_levels - i],
                out_channels=self.num_layers[n_levels - i - 1],
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_list_{i - 1}")(x, encoded_list[-i], train=train)
        x = _conv(self.dim_output * self.emb_window ** 2, self.kernel_size,
                  padding=self.kernel_size // 2, dtype=self.dtype,
                  name="final_block")(x)
        x = ops.windows_unembedding(x, self.emb_window)
        return nn.softmax(x.astype(jnp.float32), axis=-1)


class ROIDecoder(nn.Module):
    """The live decoder (Unet_3Dblock.py:1277-1396).

    Per level, bottleneck up: trilinear upsample (alternating depth factor)
    -> aux mask head (softmax over dim_output, deep supervision) ->
    attention-gate the skip -> ROIBridge(skip * gate, foreground) -> UpBlock
    merge. Final conv emits dim_output * 4 channels that window-unembed back
    to full resolution, then channel softmax.

    Returns (out, mask_list) with mask_list ordered coarse -> fine.
    """

    num_layers: Sequence[int]
    roi_size_list: Sequence[int]
    is_roi_list: Sequence[bool]
    dim_output: int
    kernel_size: int = 3
    nhead_lens: int = 32
    dropout: float = 0.2
    n_layers: int = 8
    emb_window: int = 2
    packed_levels: int = 0
    folded: Optional[bool] = None
    paired: Optional[bool] = None
    apply_softmax: bool = True
    return_packed_logits: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, encoded_list, train: bool = False):
        layers = list(self.num_layers)
        n_levels = len(layers)
        mask_list = []
        folded = (pc.FOLDED_LAYOUT_DEFAULT if self.folded is None
                  else self.folded)
        paired_flag = (pc.PAIRED_LAYOUT_DEFAULT if self.paired is None
                       else self.paired)
        n = None  # volume count, set on entering the packed levels
        lvl0_paired = False  # whether level 0 actually ran paired
        x_packed = False  # x still carries the PACKED folded layout

        for i in range(n_levels):
            if i == 0:
                x = ConnectBridge(
                    d_model=layers[-1],
                    nhead=layers[-1] // self.nhead_lens,
                    dropout=self.dropout,
                    n_layers=self.n_layers,
                    dtype=self.dtype,
                    name=f"bridge_list_{n_levels - 1}")(x, train=train)
                continue

            level = n_levels - 1 - i
            if level < min(self.packed_levels, n_levels - 2):
                # upsample directly into the packed layout (no full-res
                # unpacked intermediate)
                z2 = decoder_scale(n_levels, i)[2] == 2
                if folded:
                    if n is None:
                        # first packed level: x arrives unpacked 5D from the
                        # level above — the region's one entry transpose
                        n = x.shape[0]
                        x = pc.fold_depth(x)
                    d_after = (x.shape[0] // n) * (2 if z2 else 1)
                    lvl_paired = _use_paired(paired_flag, folded,
                                             layers[level], d_after)
                    if x_packed:
                        # x stayed PACKED from the level above: the merged
                        # (row, sub-lane-phase) contraction upsamples it
                        # directly — the unpack round trip never exists
                        xp = pc.packed_upsample_x2_packed_in(
                            x, n_volumes=n, z2=z2,
                            pair=lvl_paired and not z2)
                        if lvl_paired and z2:
                            xp = pc.fold_pairs(xp, n)
                    elif lvl_paired and not z2:
                        # pair-first: one full-tensor transpose, not two
                        xp = pc.packed_upsample_x2_paired(x, n_volumes=n)
                    else:
                        xp = pc.packed_upsample_x2_folded(x, n_volumes=n,
                                                          z2=z2)
                        if lvl_paired:
                            xp = pc.fold_pairs(xp, n)
                else:
                    xp = pc.packed_upsample_x2(x, z2=z2)
                    lvl_paired = False  # paired requires the folded regime
                x = self._packed_level(xp, encoded_list[-i], level, i,
                                       mask_list, train, n_volumes=n,
                                       paired=lvl_paired)
                if level == 0:
                    lvl0_paired = lvl_paired
                if level > 0:
                    if lvl_paired:
                        x = pc.unfold_pairs(x, n)
                    if folded:
                        # the next (packed) level upsamples straight from
                        # the packed layout (packed_upsample_x2_packed_in)
                        x_packed = True
                    else:
                        x = pk.unpack(x)
                continue

            x = ops.resize_linear_align_corners(x, decoder_scale(n_levels, i))

            mask = _conv(self.dim_output, self.kernel_size,
                         padding=self.kernel_size // 2, dtype=self.dtype,
                         name=f"mask_conv_list_{n_levels - 1 - i}")(x)
            mask = nn.softmax(mask.astype(jnp.float32), axis=-1)
            mask_list.append(mask)

            skip = encoded_list[-i]
            gate = SpatialAttentionGate(
                in_channel1=layers[n_levels - 1 - i],
                in_channel2=layers[n_levels - i],
                inter_channel=layers[n_levels - 1 - i],
                dtype=self.dtype,
                name=f"att_conv_list_{n_levels - 1 - i}")(skip, x)
            skip = skip * gate.astype(skip.dtype)

            level = n_levels - 1 - i
            if self.is_roi_list[level]:
                d_model = min(4 * layers[level], 256)
                foreground = (1.0 - mask[..., 0:1]).astype(skip.dtype)
                bridged = ROIBridge(
                    in_dim=layers[level],
                    d_model=d_model,
                    nhead=d_model // 32,
                    dropout=self.dropout,
                    n_layers=self.n_layers,
                    roi_size=self.roi_size_list[level],
                    dtype=self.dtype,
                    name=f"bridge_list_{level}")(skip, foreground, train=train)
            else:
                bridged = InitialBridge(name=f"bridge_list_{level}")(skip)

            x = UpBlock(
                in_channels=layers[n_levels - i],
                out_channels=layers[n_levels - i - 1],
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_list_{i - 1}")(x, bridged, train=train)

        if min(self.packed_levels, n_levels - 2) > 0:
            # only when level 0 actually ran packed (x is still packed here;
            # lvl0_paired was recorded when level 0 ran, so the epilogue
            # always matches the layout x actually carries)
            x = pk.PackedConv(self.dim_output * self.emb_window ** 2,
                              layers[0], mode="s1",
                              kernel_size=self.kernel_size, dtype=self.dtype,
                              name="final_block")(x, n_volumes=n,
                                                  paired=lvl0_paired)
            if lvl0_paired:
                # back to the folded layout for the (unchanged) epilogue
                x = pc.unfold_pairs(x, n)
            if self.return_packed_logits and not self.apply_softmax:
                # eval fast path: the caller computes the one-hot argmax in
                # the packed layout (models.registry.packed_one_hot_argmax2)
                # — a full-res (…, 2) argmax pays a ~15x lane-padding tax.
                # Folded regime: logits stay FOLDED (N*D, H2, W2, 4C);
                # the caller unfolds after its lane compare.
                return x, mask_list
            if folded:
                x = pc.unfold_depth(pc.unpack_folded(x), n)
            else:
                x = pk.unpack(x)
        else:
            x = _conv(self.dim_output * self.emb_window ** 2,
                      self.kernel_size, padding=self.kernel_size // 2,
                      dtype=self.dtype, name="final_block")(x)
        x = ops.windows_unembedding(x, self.emb_window)
        if not self.apply_softmax:
            # eval fast path: argmax(softmax(x)) == argmax(x), so the caller
            # can one-hot the raw logits and skip a full-res f32 softmax
            return x, mask_list
        return nn.softmax(x.astype(jnp.float32), axis=-1), mask_list

    def _packed_level(self, xp: Array, skip_p: Array, level: int, i: int,
                      mask_list, train: bool,
                      n_volumes: Optional[int] = None,
                      paired: bool = False) -> Array:
        """Decoder level on the packed layout (same math, measured ~3x).

        ``xp`` arrives PACKED (packed_upsample_x2 output); ``skip_p`` arrives
        packed from the packed encoder level. Returns the packed merged
        feature at ``level`` resolution (the caller unpacks unless level ==
        0, whose output feeds the packed final conv directly).

        ``n_volumes`` set => FOLDED regime: xp/skip_p are (N*D, H2, W2, 4C)
        and the level is transpose-free except the mask unfold (tiny) and
        the ROIBridge crossing (the bridge is inherently 5D).
        ``paired`` => the 8C depth-pair layout on top (narrow levels).
        """
        layers = list(self.num_layers)
        nv = n_volumes
        folded = nv is not None
        # Eval fast path (return_packed_logits is set ONLY by the caller
        # branch that discards mask_list): the full-resolution 5D mask
        # unfolds exist solely to feed mask_list; only the 1-channel
        # foreground is consumed (by ROIBridge's bbox). Skip the full
        # unfold and unfold just the foreground group — the mask conv
        # still runs unconditionally so the param tree matches train.
        need_mask = not self.return_packed_logits

        mask_p = pk.PackedConv(self.dim_output, layers[level + 1], mode="s1",
                               kernel_size=self.kernel_size, dtype=self.dtype,
                               name=f"mask_conv_list_{level}")(
                                   xp, n_volumes=nv, paired=paired)
        shape = mask_p.shape
        sub = (2, self.dim_output, 4) if paired else (self.dim_output, 4)
        grouped = None
        if need_mask or self.is_roi_list[level]:
            grouped = nn.softmax(
                mask_p.reshape(shape[:-1] + sub).astype(jnp.float32), axis=-2)
        mask = None
        if need_mask:
            g = grouped.reshape(shape)
            if paired:
                g = pc.unfold_pairs(g, nv)
            if folded:
                mask = pc.unfold_depth(pc.unpack_folded(g), nv)
            else:
                mask = pk.unpack(g)
            mask_list.append(mask)

        gate_p = pk.PackedSpatialAttentionGate(
            in_channel1=layers[level], in_channel2=layers[level + 1],
            inter_channel=layers[level], dtype=self.dtype,
            name=f"att_conv_list_{level}")(skip_p, xp, n_volumes=nv,
                                           paired=paired)
        if paired:
            skip_p = pc.packed_scale_paired(
                skip_p, gate_p.astype(skip_p.dtype), layers[level])
        else:
            skip_p = pc.packed_scale(skip_p, gate_p.astype(skip_p.dtype),
                                     layers[level])

        if self.is_roi_list[level]:
            d_model = min(4 * layers[level], 256)
            if need_mask:
                foreground = (1.0 - mask[..., 0:1]).astype(skip_p.dtype)
            else:
                # unfold ONLY the foreground channel group (1/dim_output of
                # the full-mask unfold the train path pays)
                fg = 1.0 - grouped[..., 0, :]  # (..., [2,] 4)
                fg = fg.reshape(shape[:-1] + ((8,) if paired else (4,)))
                if paired:
                    fg = pc.unfold_pairs(fg, nv)
                if folded:
                    fg5 = pc.unfold_depth(pc.unpack_folded(fg), nv)
                else:
                    fg5 = pk.unpack(fg)
                foreground = fg5.astype(skip_p.dtype)
            skip_p4 = pc.unfold_pairs(skip_p, nv) if paired else skip_p
            if folded:
                skip_5d = pc.unfold_depth(pc.unpack_folded(skip_p4), nv)
            else:
                skip_5d = pk.unpack(skip_p4)
            bridged = ROIBridge(
                in_dim=layers[level], d_model=d_model, nhead=d_model // 32,
                dropout=self.dropout, n_layers=self.n_layers,
                roi_size=self.roi_size_list[level], dtype=self.dtype,
                name=f"bridge_list_{level}")(skip_5d, foreground,
                                             train=train)
            if folded:
                bridged = pc.pack_folded(pc.fold_depth(bridged))
                if paired:
                    bridged = pc.fold_pairs(bridged, nv)
            else:
                bridged = pk.pack(bridged)
        else:
            bridged = skip_p

        return pk.PackedUpBlock(
            in_channels=layers[level + 1], out_channels=layers[level],
            kernel_size=self.kernel_size, dropout=self.dropout,
            dtype=self.dtype,
            name=f"block_list_{i - 1}")(xp, bridged, train=train,
                                        n_volumes=nv, paired=paired)


class MaskDecoder(nn.Module):
    """Mask-pyramid upsampler (Unet_3Dblock.py:1399-1424); out of the live path."""

    num_layers: Sequence[int]

    @nn.compact
    def __call__(self, mask_list):
        n = len(self.num_layers)
        assert len(mask_list) == n - 1, "the layer should be same"
        out = []
        for i, mask in enumerate(mask_list):
            j = n - 2 - i
            scale = (2 ** (j + 1), 2 ** (j + 1), 2 ** (j // 2))
            out.append(ops.resize_linear_align_corners(mask, scale))
        return out
