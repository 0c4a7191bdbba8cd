"""Model zoo + registry (mirrors model/trans_3DUnet.py:1-222).

Same five registry names as the reference's ``Model_Dict``
(trans_3DUnet.py:207-213). Each model is a flax module; training-mode
forwards return ``(probabilities, mask_list)`` for the flagship and plain
probabilities otherwise; eval-mode forwards return a one-hot argmax for
MaskTransUnet (trans_3DUnet.py:196-202).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lintransunet_tpu.models.bridges import Bridge, ConnectBridge
from lintransunet_tpu.models.unet import Decoder, Encoder, ROIDecoder

Array = jnp.ndarray


def one_hot_argmax(out: Array) -> Array:
    """Channel argmax -> one-hot, the eval branch of trans_3DUnet.py:199-202."""
    idx = jnp.argmax(out, axis=-1)
    return jax.nn.one_hot(idx, out.shape[-1], dtype=out.dtype)


def _packed_lane_one_hot(x: Array, n_classes: int) -> Array:
    """One-hot argmax over class-major lane groups of a packed tensor.

    Channel-major packing (packed ch = c*4 + sub-position) keeps the class
    in the MAJOR lane bits at every nesting level, so class k occupies the
    contiguous lane group [k*m, (k+1)*m). The argmax therefore runs as a
    running compare over n contiguous lane slices instead of a
    full-resolution (…, n) argmax that pays a huge lane-padding tax.
    First-max tie rule matches jnp.argmax (ties -> lowest class).
    """
    m = x.shape[-1] // n_classes
    best = x[..., :m]
    idx = jnp.zeros(x.shape[:-1] + (m,), jnp.int32)
    for k in range(1, n_classes):
        cand = x[..., k * m:(k + 1) * m]
        better = cand > best  # strictly greater: first max wins
        idx = jnp.where(better, k, idx)
        best = jnp.where(better, cand, best)
    return jnp.concatenate([(idx == k) for k in range(n_classes)],
                           axis=-1).astype(x.dtype)


def packed_one_hot_argmax(xp: Array, n_classes: int,
                          unpack_times: int = 2) -> Array:
    """One-hot channel argmax computed on a channel-major 2x2-packed
    tensor, then unembedded ``unpack_times`` times.

    Equivalent to one_hot_argmax on the fully unembedded logits, including
    the tie rule. The ROIDecoder's packed eval output is DOUBLY packed —
    the compute packing on top of the model's own window embedding — hence
    the default unpack_times=2.
    """
    from lintransunet_tpu import ops

    oh = _packed_lane_one_hot(xp, n_classes)
    for _ in range(unpack_times):
        oh = ops.windows_unembedding(oh, 2)
    return oh


def packed_one_hot_argmax2(xp: Array, unpack_times: int = 2) -> Array:
    """packed_one_hot_argmax specialised to dim_output=2."""
    return packed_one_hot_argmax(xp, 2, unpack_times)


def folded_one_hot_argmax(xf: Array, n_classes: int, n_volumes: int) -> Array:
    """packed_one_hot_argmax for FOLDED doubly-packed logits
    (N*D, H2, W2, 4C): lane compare in the folded layout, one folded
    unembed, unfold, then the model-level window unembed."""
    from lintransunet_tpu import ops
    from lintransunet_tpu.ops import packed_conv as pc

    oh = _packed_lane_one_hot(xf, n_classes)
    oh = pc.unfold_depth(pc.unpack_folded(oh), n_volumes)
    return ops.windows_unembedding(oh, 2)


def folded_one_hot_argmax2(xf: Array, n_volumes: int) -> Array:
    """folded_one_hot_argmax specialised to dim_output=2."""
    return folded_one_hot_argmax(xf, 2, n_volumes)


def folded_one_hot_fg(xf: Array, n_volumes: int) -> Array:
    """Class-1 (foreground) channel of folded_one_hot_argmax2, computed at
    HALF the epilogue width.

    For dim_output=2 the one-hot output satisfies ch0 == 1 - ch1 exactly,
    and that identity survives any weighted sliding-window blend
    (sum(w*(1-p))/sum(w) == 1 - sum(w*p)/sum(w)) — so eval can emit just
    the foreground and the runner derives the background once per volume
    (SlidingWindowRunner(derive_background=True)). Halves the
    full-resolution epilogue transposes and the per-window blend traffic
    (~2.8 ms/window of epilogue copies on the round-4 trace). Tie rule
    matches jnp.argmax (tie -> class 0 -> fg 0: strict >)."""
    m = xf.shape[-1] // 2
    fg = (xf[..., m:] > xf[..., :m]).astype(xf.dtype)
    from lintransunet_tpu import ops
    from lintransunet_tpu.ops import packed_conv as pc

    fg = pc.unfold_depth(pc.unpack_folded(fg), n_volumes)
    return ops.windows_unembedding(fg, 2)


def packed_one_hot_fg(xp: Array, unpack_times: int = 2) -> Array:
    """folded_one_hot_fg for the packed 5D eval layout."""
    from lintransunet_tpu import ops

    m = xp.shape[-1] // 2
    fg = (xp[..., m:] > xp[..., :m]).astype(xp.dtype)
    for _ in range(unpack_times):
        fg = ops.windows_unembedding(fg, 2)
    return fg


class TraditionUnet(nn.Module):
    """Plain 3D UNet (trans_3DUnet.py:7-35)."""

    num_layers: Sequence[int]
    dim_input: int
    dim_output: int
    kernel_size: int = 3
    dropout: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bottle, skips = Encoder(self.num_layers, self.dim_input,
                                self.kernel_size, self.dropout,
                                dtype=self.dtype, name="encode")(x, train=train)
        return Decoder(self.num_layers, self.dim_output, self.kernel_size,
                       self.dropout, dtype=self.dtype,
                       name="decode")(bottle, skips, train=train)


class BottleTransUnet(nn.Module):
    """UNet + bottleneck transformer (trans_3DUnet.py:38-68)."""

    num_layers: Sequence[int]
    dim_input: int
    dim_output: int
    kernel_size: int = 3
    dropout: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bottle, skips = Encoder(self.num_layers, self.dim_input,
                                self.kernel_size, self.dropout,
                                dtype=self.dtype, name="encode")(x, train=train)
        bottle = ConnectBridge(d_model=self.num_layers[-1], nhead=8,
                               dropout=self.dropout, n_layers=4,
                               dtype=self.dtype,
                               name="connect_bridge")(bottle, train=train)
        return Decoder(self.num_layers, self.dim_output, self.kernel_size,
                       self.dropout, dtype=self.dtype,
                       name="decode")(bottle, skips, train=train)


class SkipTransUnet(nn.Module):
    """Per-skip bottleneck transformers (trans_3DUnet.py:71-111).

    Faithful quirk: the reference computes transformed skips into
    ``inter_block_list`` but then decodes with the *raw* skips
    (trans_3DUnet.py:102-111) — dead compute. We keep the transformed-skip
    modules and decode with raw skips for checkpoint/behaviour parity.
    """

    num_layers: Sequence[int]
    dim_input: int
    dim_output: int
    kernel_size: int = 3
    dropout: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bottle, skips = Encoder(self.num_layers, self.dim_input,
                                self.kernel_size, self.dropout,
                                dtype=self.dtype, name="encode")(x, train=train)
        n = len(self.num_layers)
        connect_bottle = bottle
        for i in range(n):
            bridge = ConnectBridge(d_model=self.num_layers[i], nhead=8,
                                   dropout=self.dropout, n_layers=4,
                                   dtype=self.dtype,
                                   name=f"connect_bridge_list_{i}")
            if i != n - 1:
                _ = bridge(skips[i], train=train)  # dead compute, kept faithful
            else:
                connect_bottle = bridge(bottle, train=train)
        return Decoder(self.num_layers, self.dim_output, self.kernel_size,
                       self.dropout, dtype=self.dtype,
                       name="decode")(connect_bottle, skips, train=train)


class MaskSkipTransUnet(nn.Module):
    """Skip transformers gated by predicted masks (trans_3DUnet.py:114-147).

    The reference path is broken at construction (SURVEY.md 2a#14); this is
    the fixed-and-flagged build on top of the repaired ``Bridge``.
    """

    num_layers: Sequence[int]
    dim_input: int
    dim_output: int
    kernel_size: int = 3
    dropout: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        bottle, skips = Encoder(self.num_layers, self.dim_input,
                                self.kernel_size, self.dropout,
                                dtype=self.dtype, name="encode")(x, train=train)
        bottle, trans_skips, mask_list = Bridge(
            num_layers=tuple(self.num_layers), nhead_lens=16,
            dtype=self.dtype, name="connect_bridge")(bottle, skips, train=train)
        out = Decoder(self.num_layers, self.dim_output, self.kernel_size,
                      self.dropout, dtype=self.dtype,
                      name="decode")(bottle, trans_skips, train=train)
        return out, mask_list


class MaskTransUnet(nn.Module):
    """The flagship model (trans_3DUnet.py:150-204): Encoder -> ROIDecoder.

    train=True returns (out, mask_list); train=False returns the one-hot
    argmax of the channel softmax, as the reference eval branch does.
    """

    num_layers: Sequence[int]
    roi_size_list: Sequence[int]
    is_roi_list: Sequence[bool]
    dim_input: int
    dim_output: int
    kernel_size: int = 3
    dropout: float = 0.3
    packed_levels: int = 0
    folded: Optional[bool] = None
    paired: Optional[bool] = None
    n_layers: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False, return_aux=None,
                 fg_only: bool = False):
        """``train`` gates dropout; ``return_aux`` (default: train) selects
        the (out, mask_list) train branch vs the one-hot-argmax eval branch,
        so the train branch can be evaluated deterministically. ``fg_only``
        (eval branch, dim_output=2 only) emits just the class-1 one-hot
        channel — see folded_one_hot_fg for why and when that is exact."""
        from lintransunet_tpu.ops import packed_conv as pc

        if fg_only and self.dim_output != 2:
            raise ValueError("fg_only eval requires dim_output == 2")

        if return_aux is None:
            return_aux = train
        n_levels = len(self.num_layers)
        packed_eval = (not return_aux and self.dim_output >= 2
                       and min(self.packed_levels, n_levels - 2) > 0)
        folded = (pc.FOLDED_LAYOUT_DEFAULT if self.folded is None
                  else self.folded)
        bottle, skips = Encoder(self.num_layers, self.dim_input,
                                self.kernel_size, self.dropout,
                                packed_levels=self.packed_levels,
                                folded=folded, paired=self.paired,
                                dtype=self.dtype, name="encode")(x, train=train)
        out, mask_list = ROIDecoder(
            num_layers=self.num_layers,
            roi_size_list=self.roi_size_list,
            is_roi_list=self.is_roi_list,
            dim_output=self.dim_output,
            dropout=self.dropout,
            packed_levels=self.packed_levels,
            folded=folded,
            paired=self.paired,
            n_layers=self.n_layers,
            # eval branch one-hots the argmax, which softmax cannot change —
            # skip the full-resolution f32 softmax there
            apply_softmax=return_aux,
            return_packed_logits=packed_eval,
            dtype=self.dtype,
            name="decode")(bottle, skips, train=train)
        if return_aux:
            return out, mask_list
        if packed_eval:
            if folded:
                if fg_only:
                    return folded_one_hot_fg(out, x.shape[0])
                return folded_one_hot_argmax(out, self.dim_output, x.shape[0])
            if fg_only:
                return packed_one_hot_fg(out)
            return packed_one_hot_argmax(out, self.dim_output)
        oh = one_hot_argmax(out)
        return oh[..., 1:] if fg_only else oh


Model_Dict = {
    "TraditionUnet": TraditionUnet,
    "BottleTransUnet": BottleTransUnet,
    "SkipTransUnet": SkipTransUnet,
    "MaskSkipTransUnet": MaskSkipTransUnet,
    "MaskTransUnet": MaskTransUnet,
}


def get_model_dict(name: str):
    """Registry lookup, same API as trans_3DUnet.py:215-222."""
    return Model_Dict[name]
