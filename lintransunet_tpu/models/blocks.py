"""UNet building blocks + attention blocks (flax.linen, channels-last).

Re-implements the block zoo of ``model/Unet_3Dblock.py`` and
``model/trans_block.py`` TPU-first:

* activations are ``(N, H, W, D, C)`` so convs tile onto the MXU;
* attention token order is (D, H, W) flattened, matching the reference's
  permute-then-flatten (Unet_3Dblock.py:481-482);
* submodule names mirror the reference's attribute paths (list index ``i``
  becomes suffix ``_i``) so reference torch checkpoints convert 1:1 via
  :mod:`lintransunet_tpu.compat.torch_import`.

Parameters are float32; the ``dtype`` field selects the compute dtype
(bfloat16 in production — the TPU analogue of the reference's AMP autocast).
"""

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lintransunet_tpu import ops

Array = jnp.ndarray

# Rematerialisation policy for the training backward (read once at import,
# same trace-time contract as ops.packed_conv.FORCE_CONV3D):
#   "attn"  — wrap every SelfAttentionLayer in jax.checkpoint, so the
#             backward recomputes the attention/FFN intermediates instead of
#             saving ~6 (N, tokens, C) tensors per layer x 8 layers x 4
#             bridges. The layers are bandwidth-bound (docs/DESIGN.md §9),
#             so the recompute is cheap relative to the HBM it frees —
#             this is what buys train_batch > 1 on a 16 GB chip.
# Eval (train=False) never remats; parameters/checkpoints are unaffected.
REMAT = os.environ.get("LINTRANSUNET_REMAT", "")

# Fused QKV projection for self-attention (A/B knob, decided on the full
# bench like every round-3 lever): the three Q/K/V Dense layers of
# MultiheadLinearAttention read the same (N, tokens, d) activation three
# times. With q is k is v (always true in this model — every call site is
# self-attention), concatenating the three kernels at apply time turns them
# into ONE (tokens, d) @ (d, 3d) GEMM: one activation read instead of three,
# identical contractions (exact), identical checkpoint tree.
FUSED_QKV = os.environ.get("LINTRANSUNET_FUSED_QKV", "") == "1"


def _conv(features: int, kernel: int, stride=1, padding=0, groups: int = 1,
          dtype=None, name: str = None) -> nn.Conv:
    """nn.Conv configured for torch-compatible explicit symmetric padding."""
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = ((padding, padding),) * 3
    return nn.Conv(
        features=features,
        kernel_size=(kernel,) * 3,
        strides=stride,
        padding=padding,
        feature_group_count=groups,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _gelu(x: Array) -> Array:
    # torch F.gelu default is the exact erf formulation.
    return nn.gelu(x, approximate=False)


class ConvPosEmbed3d(nn.Module):
    """Depthwise-conv positional encoding generator (PEG).

    Mirrors ``Conv3dPosEmbedding`` (trans_block.py:70-96): residual depthwise
    3x3x3 conv followed by channel dropout (torch Dropout3d).
    """

    dim: int
    dropout: float
    emb_kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pos = _conv(self.dim, self.emb_kernel, padding=self.emb_kernel // 2,
                    groups=self.dim, dtype=self.dtype, name="proj")(x)
        x = x + pos
        return nn.Dropout(self.dropout, broadcast_dims=(1, 2, 3))(
            x, deterministic=not train)


class ConvPosEmbed2d(nn.Module):
    """2D twin of the PEG (``Conv2dPosEmbedding``, trans_block.py:99-125).

    Dead code in the reference (no call site; its docstring even still
    claims 5D input, which nn.Conv2d would reject) — ported for 100%
    symbol coverage. Input (N, H, W, C) channels-last; residual depthwise
    kxk conv, then channel dropout (torch Dropout2d semantics: whole
    channels, broadcast over H, W).
    """

    dim: int
    dropout: float
    emb_kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pos = nn.Conv(self.dim, (self.emb_kernel,) * 2,
                      padding=self.emb_kernel // 2,
                      feature_group_count=self.dim, dtype=self.dtype,
                      name="proj")(x)
        x = x + pos
        return nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
            x, deterministic=not train)


class _ProjParams(nn.Module):
    """Kernel+bias of one Q/K/V projection, declared without computing.

    Mirrors nn.Dense's parameter names/shapes/initialisers exactly so the
    fused-QKV path shares the checkpoint tree with the unfused one
    (``linears_{i}/kernel|bias``).
    """

    d_model: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.d_model, self.d_model), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.d_model,), jnp.float32)
        return kernel, bias


class MultiheadLinearAttention(nn.Module):
    """Multi-head O(N) linear attention (``MultihAttention``, trans_block.py:127-166).

    Four shared Dense projections; heads split to (B, h, N, d_k); the
    linear-attention core from :mod:`lintransunet_tpu.ops.attention`.
    Note: in the reference, attention dropout only touches the *unused*
    ``score_softmax`` return (trans_block.py:62-67), so it has no effect on
    the output — faithfully, no dropout is applied here either.
    """

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 src_mask: Optional[Array] = None, train: bool = False) -> Array:
        assert self.d_model % self.nhead == 0
        d_k = self.d_model // self.nhead
        n_batch = q.shape[0]
        dense = lambda i: nn.Dense(self.d_model, dtype=self.dtype,
                                   param_dtype=jnp.float32, name=f"linears_{i}")

        def split(t):
            return t.reshape(n_batch, -1, self.nhead, d_k).transpose(0, 2, 1, 3)

        if FUSED_QKV and q is k and k is v:
            kb = [_ProjParams(self.d_model, name=f"linears_{i}")()
                  for i in range(3)]
            w = jnp.concatenate([kern for kern, _ in kb], axis=1)
            b = jnp.concatenate([bias for _, bias in kb])
            x, w, b = nn.dtypes.promote_dtype(q, w, b, dtype=self.dtype)
            qkv = x @ w + b
            q, k, v = (split(t) for t in jnp.split(qkv, 3, axis=-1))
        else:
            q, k, v = (split(dense(i)(t)) for i, t in enumerate((q, k, v)))
        if src_mask is not None:
            src_mask = src_mask[:, None]  # (B, 1, N, 1)
            x = ops.linear_attention(q, k, v, mask=src_mask)
        else:
            from lintransunet_tpu.ops.pallas_attention import (
                linear_attention_pallas, pallas_supported)

            if pallas_supported():
                # fused Pallas kernel on TPU (ops/pallas_attention.py)
                x = linear_attention_pallas(q, k, v)
            else:
                x = ops.linear_attention(q, k, v)
        x = x.transpose(0, 2, 1, 3).reshape(n_batch, -1, self.d_model)
        return dense(3)(x)


class SelfAttentionLayer(nn.Module):
    """Post-LN transformer encoder layer (trans_block.py:169-211).

    FFN is Dense -> GELU(exact) -> dropout -> Dense; residuals are wrapped by
    LayerNorm with eps=1e-6 *after* the add (post-LN).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, src_mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        attn = MultiheadLinearAttention(
            self.d_model, self.nhead, self.dropout, dtype=self.dtype,
            name="self_attn")(x, x, x, src_mask=src_mask, train=train)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="layer_norm1")(x)

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear1")(x)
        h = nn.Dropout(self.dropout)(_gelu(h), deterministic=not train)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="layer_norm2")(x)


def _attn_layer_cls(train: bool):
    """SelfAttentionLayer, checkpointed under the "attn" remat policy.

    nn.remat preserves the wrapped module's parameter structure, so the
    checkpoint format is identical either way. static_argnums=(3,) marks
    ``train`` (module is argument 0) — it drives python control flow.
    Callers must pass (x, mask, train) positionally on the remat path.
    """
    if train and REMAT == "attn":
        return nn.remat(SelfAttentionLayer, static_argnums=(3,))
    return SelfAttentionLayer


class TransEncoder(nn.Module):
    """N-layer stack of SelfAttentionLayer (trans_block.py:214-232)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    n_layers: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        for i in range(self.n_layers):
            x = _attn_layer_cls(train)(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype, name=f"layers_{i}")(x, mask, train)
        return x


def _to_tokens_dhw(x: Array) -> Tuple[Array, Tuple[int, int, int]]:
    """(N, H, W, D, C) -> (N, D*H*W, C) in the reference's (D, H, W) order."""
    n, h, w, d, c = x.shape
    t = x.transpose(0, 3, 1, 2, 4).reshape(n, d * h * w, c)
    return t, (h, w, d)


def _from_tokens_dhw(t: Array, hwd: Tuple[int, int, int]) -> Array:
    h, w, d = hwd
    n, _, c = t.shape
    return t.reshape(n, d, h, w, c).transpose(0, 2, 3, 1, 4)


def _fused_layer_stack(module, x: Array, peg_name: str,
                       n_layers: int, nhead: int) -> Array:
    """Eval fast path: (N, H, W, D, C) grid through L fused transformer
    layers via the Pallas stack kernel (ops/pallas_layer.py), splitting at
    the PEG re-injection after layer 0. Returns the processed 5D grid.

    Tokens are taken in the array's NATURAL (H, W, D) order — a pure
    reshape. Linear attention is permutation-invariant over tokens
    (softmax over the token axis + unweighted sums, trans_block.py:41-67),
    so this preserves reference semantics while avoiding the (D, H, W)
    transpose the unfused path performs: a Pallas custom call pins its
    operand/result layouts, so that transpose MATERIALISES at the kernel
    boundary instead of fusing into the projection matmuls, and was
    measured to cost more than the fused kernels save (~13 ms/window on
    v5e). The PEG — whose 3^3 depthwise kernel axes ARE order-sensitive —
    runs directly on the (H, W, D) grid with its kernel permuted to match
    the reference's (D, H, W) application (Unet_3Dblock.py:265-270).

    Reads the params created by the unfused loop (which always runs at
    init) via ``module.variables`` — same names, same checkpoint format;
    only the execution schedule differs.
    """
    from lintransunet_tpu.ops import pallas_layer as pll

    n, h, w, d, c = x.shape
    p = module.variables["params"]
    # Layout guards at every grid<->token transition: the Pallas custom
    # call pins its operand/result to the default token layout, and without
    # barriers XLA back-propagates that into the NEIGHBOURING conv/IN
    # fusions, which then run with degenerate T(1,128)/T(2,128) tilings
    # (xplane-traced: ~8 ms of extra fusion time per eval window). The
    # barrier pins each side to its natural layout; the relayout becomes
    # one explicit well-tiled copy.
    tokens = jax.lax.optimization_barrier(x).reshape(n, h * w * d, c)
    a0, w20, v0 = pll.stack_layer_params([p["layers_0"]])
    tokens = pll.fused_transformer_stack(tokens, a0, w20, v0, nhead)

    grid = jax.lax.optimization_barrier(tokens.reshape(n, h, w, d, c))
    peg = p[peg_name]["proj"]
    kern = jnp.transpose(peg["kernel"], (1, 2, 0, 3, 4))  # (kd,kh,kw)->(kh,kw,kd)
    dt = x.dtype
    pos = jax.lax.conv_general_dilated(
        grid.astype(dt), kern.astype(dt), (1, 1, 1),
        [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        feature_group_count=c) + peg["bias"].astype(dt)
    grid = grid + pos  # residual add; Dropout3d is a no-op at eval
    tokens = jax.lax.optimization_barrier(grid).reshape(n, h * w * d, c)

    if n_layers > 1:
        a1, w21, v1 = pll.stack_layer_params(
            [p[f"layers_{i}"] for i in range(1, n_layers)])
        tokens = pll.fused_transformer_stack(tokens, a1, w21, v1, nhead)
    # Layout guard (same pattern as _peg_on_tokens): the custom call pins
    # its result to the default token layout; without a barrier after the
    # reshape, that layout propagates into the downstream decoder convs.
    return jax.lax.optimization_barrier(tokens.reshape(n, h, w, d, c))


def _peg_on_tokens(tokens: Array, hwd: Tuple[int, int, int], peg,
                   train: bool) -> Array:
    """Apply a PEG to (D, H, W)-ordered tokens.

    The reference re-injects its positional conv on a tensor whose spatial
    order is (D, H, W) (Unet_3Dblock.py:265-270, 487-490), so the depthwise
    kernel's leading dim convolves depth. Tokens are d-major, so this is a
    pure reshape — no transpose needed.
    """
    h, w, d = hwd
    n, _, c = tokens.shape
    grid = tokens.reshape(n, d, h, w, c)
    grid = peg(grid, train=train)
    out = grid.reshape(n, d * h * w, c)
    # Layout guard: without a barrier here, XLA lets the 5D grid layout of
    # the PEG round-trip leak into the token buffer, and EVERY subsequent
    # attention layer in the stack runs ~3-4x slower (measured on v5e:
    # 12.0 -> 3.6 ms for an 8-layer stack on 28704 tokens). The barrier is
    # an identity that pins the flattened tokens back to the natural
    # (n, tokens, c) layout before the next layer consumes them.
    return jax.lax.optimization_barrier(out)


class PosAttention3DBlock(nn.Module):
    """Token transformer over a 3D feature map, PEG re-injected after layer 0.

    Mirrors ``PosAttention3DBlock`` (Unet_3Dblock.py:224-274). Only
    ``pos_encoders_0`` is ever used in the reference loop, so only it is
    materialised (the torch module clones N of them; the converter skips the
    dead ones).
    """

    in_dim: int
    d_model: int
    nhead: int
    dropout: float = 0.3
    n_layers: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        from lintransunet_tpu.ops.pallas_layer import fused_stack_supported

        n_tok = x.shape[1] * x.shape[2] * x.shape[3]
        if (not train and mask is None and not self.is_initializing()
                and fused_stack_supported(self.d_model, self.nhead, n_tok)):
            return _fused_layer_stack(self, x, "pos_encoders_0",
                                      self.n_layers, self.nhead)
        tokens, hwd = _to_tokens_dhw(x)
        if mask is not None:
            mask, _ = _to_tokens_dhw(mask)
            mask = mask != 0
        peg_f = lambda: ConvPosEmbed3d(self.d_model, self.dropout,
                                       dtype=self.dtype,
                                       name="pos_encoders_0")
        for i in range(self.n_layers):
            tokens = _attn_layer_cls(train)(
                self.d_model, self.nhead, 2 * self.d_model, self.dropout,
                dtype=self.dtype, name=f"layers_{i}")(tokens, mask, train)
            if i == 0:
                tokens = _peg_on_tokens(tokens, hwd, peg_f(), train)
        return _from_tokens_dhw(tokens, hwd)


class SpatialAttentionGate(nn.Module):
    """Additive attention gate (``SpatialAttention3DBlock``, Unet_3Dblock.py:194-221).

    psi(relu(Wx(skip) + Wg(up))) -> sigmoid map. All convs are 1x1x1;
    InstanceNorm is affine-free so it contributes no parameters.
    """

    in_channel1: int
    in_channel2: int
    inter_channel: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, up: Array) -> Array:
        xs = _conv(self.inter_channel, 1, dtype=self.dtype, name="W_x_0")(x)
        xs = ops.instance_norm(xs)
        gs = _conv(self.inter_channel, 1, dtype=self.dtype, name="W_g_0")(up)
        gs = ops.instance_norm(gs)
        a = nn.relu(xs + gs)
        a = _conv(1, 1, dtype=self.dtype, name="psi_0")(a)
        return nn.sigmoid(a)


class DownBlock(nn.Module):
    """Residual conv + strided-conv downsample (Unet_3Dblock.py:290-341).

    Returns (downsampled, pre-downsample skip). Anisotropic strides supported
    — the encoder halves depth only on alternating levels.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: Tuple[int, int, int] = (2, 2, 2)
    dropout: Optional[float] = None
    is_res: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
        k = self.kernel_size
        y = _conv(self.in_channels, k, padding=k // 2, dtype=self.dtype,
                  name="conv1")(x)
        y = ops.leaky_relu(ops.instance_norm(y))
        if self.is_res:
            y = y + x
        z = _conv(self.out_channels, k, stride=self.stride, padding=k // 2,
                  dtype=self.dtype, name="conv2")(y)
        z = ops.leaky_relu(ops.instance_norm(z))
        if self.dropout is not None:
            z = nn.Dropout(self.dropout)(z, deterministic=not train)
        return z, y


class UpBlock(nn.Module):
    """Conv + skip-concat + conv merge (Unet_3Dblock.py:504-557).

    Spatial upsampling happens *outside* this block (the decoder owns it).
    Concat order is (x, skip) on the channel axis, matching the reference.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, skip: Array, train: bool = False) -> Array:
        k = self.kernel_size
        x = _conv(self.out_channels, k, padding=k // 2, dtype=self.dtype,
                  name="conv1")(x)
        x = ops.leaky_relu(ops.instance_norm(x))
        x = jnp.concatenate([x, skip], axis=-1)
        x = _conv(self.out_channels, k, padding=k // 2, dtype=self.dtype,
                  name="conv2")(x)
        x = ops.leaky_relu(ops.instance_norm(x))
        if self.dropout is not None:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


def _embed_channel_list(in_channels: int, out_channels: int, times: int,
                        up: bool) -> Sequence[int]:
    """Channel schedules of Down/UpEmbedBlock (Unet_3Dblock.py:362-363, 408-409)."""
    if up:
        chans = [out_channels // (2 ** i) if out_channels // (2 ** i) >= in_channels
                 else out_channels for i in range(times + 1)]
        chans[-1] = in_channels
    else:
        chans = [in_channels * (2 ** i) if in_channels * (2 ** i) <= out_channels
                 else out_channels for i in range(times + 1)]
        chans[-1] = out_channels
    return chans


class DownEmbedBlock(nn.Module):
    """Strided-conv channel-doubling embed (Unet_3Dblock.py:343-385)."""

    in_channels: int
    out_channels: int
    down_times: int
    kernel_size: int = 3
    stride: int = 2
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        chans = _embed_channel_list(self.in_channels, self.out_channels,
                                    self.down_times, up=False)
        for i in range(self.down_times):
            x = _conv(chans[i + 1], self.kernel_size, stride=self.stride,
                      padding=1, dtype=self.dtype, name=f"module_list_{i}_0")(x)
            x = ops.leaky_relu(ops.instance_norm(x))
            if self.dropout is not None:
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class UpEmbedBlock(nn.Module):
    """Nearest-upsample + conv inverse of DownEmbedBlock (Unet_3Dblock.py:388-432).

    torch ``nn.Upsample(scale_factor=s)`` defaults to nearest mode.
    """

    in_channels: int
    out_channels: int
    down_times: int
    kernel_size: int = 3
    stride: int = 2
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        chans = _embed_channel_list(self.in_channels, self.out_channels,
                                    self.down_times, up=True)
        for i in range(self.down_times):
            x = ops.resize_nearest(x, self.stride)
            x = _conv(chans[i + 1], self.kernel_size, padding=1,
                      dtype=self.dtype, name=f"module_list_{i}_1")(x)
            x = ops.leaky_relu(ops.instance_norm(x))
            if self.dropout is not None:
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class EmbedAttention3DBlock(nn.Module):
    """Down-embed -> N linear-attention layers -> up-embed (Unet_3Dblock.py:435-501).

    The transformer applied to every warped ROI crop: stride-2 embed to
    d_model, tokens flattened in (D, H, W) order, PEG re-injection after
    layer 0, nearest-upsample decode back to in_dim channels.
    """

    in_dim: int
    d_model: int
    nhead: int
    dropout: float = 0.3
    n_layers: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from lintransunet_tpu.ops.pallas_layer import fused_stack_supported

        x = DownEmbedBlock(self.in_dim, self.d_model, down_times=1,
                           dropout=self.dropout, dtype=self.dtype,
                           name="down_embed")(x, train=train)
        n_tok = x.shape[1] * x.shape[2] * x.shape[3]
        if (not train and not self.is_initializing()
                and fused_stack_supported(self.d_model, self.nhead, n_tok)):
            x = _fused_layer_stack(self, x, "pos_encoder",
                                   self.n_layers, self.nhead)
        else:
            tokens, hwd = _to_tokens_dhw(x)
            peg_f = lambda: ConvPosEmbed3d(self.d_model, self.dropout,
                                           dtype=self.dtype,
                                           name="pos_encoder")
            for i in range(self.n_layers):
                tokens = _attn_layer_cls(train)(
                    self.d_model, self.nhead, 2 * self.d_model, self.dropout,
                    dtype=self.dtype, name=f"layers_{i}")(tokens, None, train)
                if i == 0:
                    tokens = _peg_on_tokens(tokens, hwd, peg_f(), train)
            x = _from_tokens_dhw(tokens, hwd)
        return UpEmbedBlock(self.in_dim, self.d_model, down_times=1,
                            dropout=self.dropout, dtype=self.dtype,
                            name="up_embed")(x, train=train)


class Attention3DBlock(nn.Module):
    """PEG + flatten (H, W, D order) + TransEncoder (Unet_3Dblock.py:154-191).

    Used only by dead reference paths; kept for capability parity.
    """

    in_dim: int
    d_model: int
    nhead: int
    dropout: float = 0.3
    n_layers: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        n, h, w, d, c = x.shape
        x = ConvPosEmbed3d(self.d_model, self.dropout, dtype=self.dtype,
                           name="pos_encode")(x, train=train)
        tokens = x.reshape(n, h * w * d, c)
        if mask is not None:
            mask = mask.reshape(n, h * w * d, -1) != 0
        tokens = TransEncoder(self.d_model, self.nhead, 2 * self.d_model,
                              self.n_layers, self.dropout, dtype=self.dtype,
                              name="transformer")(tokens, mask, train=train)
        return tokens.reshape(n, h, w, d, c)


class SolidBlock(nn.Module):
    """MLP solid-ness head (Unet_3Dblock.py:277-288); unused by live paths."""

    num_layer: int
    inter_num: int = 12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = nn.Dense(self.inter_num, dtype=self.dtype,
                     param_dtype=jnp.float32, name="solid_layer_0")(x)
        h = nn.BatchNorm(use_running_average=not train,
                         name="solid_layer_1")(h)
        h = nn.relu(h)
        h = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                     name="solid_layer_3")(h)
        return nn.sigmoid(h)
