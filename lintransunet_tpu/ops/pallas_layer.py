"""Fused forward-only transformer-STACK Pallas kernel (eval hot path).

The decoder bridges run stacks of post-LN linear-attention layers
(``SelfAttentionLayer``, reference model/trans_block.py:169-211) on 1k-29k
tokens at d_model 128/256. Under XLA each layer materialises ~10 HBM round
trips of the (N, C) token tensor (q/k/v/o projections, attention out,
residuals, LN, FFN hidden, FFN out): measured ~0.37 ms/layer on v5e against
a ~0.1 ms traffic floor — bandwidth-bound.

This kernel keeps the WHOLE token buffer resident in VMEM across the whole
stack: HBM traffic collapses to one read + one write of x for L layers plus
the (tiny) per-layer weights. Per layer it runs two passes over token
tiles:

* phase 0 (stats): k/v projections; online token-axis softmax stats for K
  (running column max ``m``, rescaled sum ``s``) and the rescaled context
  accumulation ``ctx += exp(k - m)^T v``. The rescale of ctx is a
  diag-matmul (mask-identity * rescale) — no sublane/lane transposes.
* phase 1 (apply): q projection; per-head feature-axis softmax (exact
  per-head max via a static masked-max loop); ``attn = q' @ (head_mask *
  ctx / s)``; output projection; +residual; LayerNorm; FFN (GELU exact);
  +residual; LayerNorm; write the tile back into the resident buffer (and
  to HBM on the last layer).

Semantics match ops.attention.linear_attention + the post-LN layer exactly
(trans_block.py:41-67, 169-211): Q' = softmax_d(Q)/sqrt(d_k), K' =
softmax_N(K), eps=1e-6 LayerNorms, erf GELU. Forward-only: training uses
the autodiff path in ops/pallas_attention.py.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG = -1e30


def stack_layer_params(layer_params):
    """[{flax SelfAttentionLayer params}] -> (A, w2, vecs) stacked arrays.

    A: (L, C, 6C) columns [Wq | Wk | Wv | Wo | W1(2C)];
    w2: (L, 2C, C); vecs: (L, 16, 2C) f32 ROWS
    [bq, bk, bv, bo, b1(2C), b2, ln1s, ln1b, ln2s, ln2b, ...pad] — rows so
    each slice broadcasts naturally over token rows inside the kernel.
    """
    As, w2s, vecs = [], [], []
    for p in layer_params:
        att = p["self_attn"]
        wq, wk, wv, wo = (att[f"linears_{i}"]["kernel"] for i in range(4))
        w1 = p["linear1"]["kernel"]          # (C, 2C)
        w2 = p["linear2"]["kernel"]          # (2C, C)
        c = wq.shape[0]
        A = jnp.concatenate([wq, wk, wv, wo, w1], axis=1)  # (C, 6C)
        cols = [
            att["linears_0"]["bias"], att["linears_1"]["bias"],
            att["linears_2"]["bias"], att["linears_3"]["bias"],
            p["linear1"]["bias"],                             # (2C,)
            p["linear2"]["bias"],
            p["layer_norm1"]["scale"], p["layer_norm1"]["bias"],
            p["layer_norm2"]["scale"], p["layer_norm2"]["bias"],
        ]
        vec = jnp.zeros((16, 2 * c), jnp.float32)
        for j, v in enumerate(cols):
            vec = vec.at[j, :v.shape[0]].set(v.astype(jnp.float32))
        As.append(A.astype(jnp.float32))
        w2s.append(w2.astype(jnp.float32))
        vecs.append(vec)
    return jnp.stack(As), jnp.stack(w2s), jnp.stack(vecs)


def fused_stack_supported(d_model: int, n_heads: int,
                          n_tokens: Optional[int] = None) -> bool:
    """Route a SelfAttentionLayer stack through the fused kernel?

    DEFAULT OFF (``LINTRANSUNET_FUSED_STACK=1`` opts in). The kernel
    itself beats the XLA layer chain 1.3-2x in isolation (v5e, N>=10k),
    but embedded in the full MaskTransUnet eval forward the program runs
    ~9 ms/window SLOWER with it routed in: xplane traces show XLA
    re-laying out the neighbouring conv/instance-norm fusions with
    degenerate T(1,128)/T(2,128) tilings around the custom calls, and the
    regression survives token-reordering, small-stack gating and
    optimization_barrier fences at every boundary (docs/DESIGN.md §10).
    Until that integration cost is beaten, the honest default is the XLA
    chain — a routed kernel must win end-to-end, not in isolation.

    When enabled: requires a TPU backend, a lane-aligned model dim and an
    even head split. Short stacks stay on the XLA chain regardless: below
    a few thousand tokens the kernel's fixed costs (grid setup, per-layer
    weight re-fetch) outweigh the HBM-round-trip savings (measured 0.82x
    at N=1024 vs 1.8x at N=28704). ``LINTRANSUNET_FUSED_MIN_TOKENS``
    overrides that threshold. Both env vars are read per call: they guard
    a trace-time routing decision, so they only matter before
    compilation."""
    import os

    from lintransunet_tpu.ops.pallas_attention import pallas_supported

    if os.environ.get("LINTRANSUNET_FUSED_STACK", "0") in ("0", "false"):
        return False
    min_tokens = int(os.environ.get("LINTRANSUNET_FUSED_MIN_TOKENS", "4096"))
    if n_tokens is not None and n_tokens < min_tokens:
        return False
    return (pallas_supported() and d_model % LANE == 0
            and d_model % n_heads == 0)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _gelu_exact(x):
    """Exact-erf GELU with an in-kernel erf (Mosaic implements neither erf
    nor erfc). Abramowitz & Stegun 7.1.26 rational polynomial: |err| <=
    1.5e-7 absolute — below f32 round-off for this use."""
    a = jnp.abs(x) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(x) * erf_abs
    return 0.5 * x * (1.0 + erf)


def _make_kernel(n_real, tile_n, c, n_heads, cdt, ln_eps=1e-6):
    """``cdt`` is the matmul operand dtype (== the token dtype): MXU inputs
    ride in it, accumulation stays f32 via preferred_element_type — the
    same contract as the flax chain's dtype-cast dot_generals."""
    d_k = c // n_heads
    inv_sqrt_dk = 1.0 / math.sqrt(d_k)

    def kernel(x_ref, a_ref, w2_ref, vec_ref, o_ref,
               x_scr, ctx_scr, m_scr, s_scr):
        l = pl.program_id(1)
        p = pl.program_id(2)
        t = pl.program_id(3)
        n_layers = pl.num_programs(1)

        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)
        valid = (rows + t * tile_n) < n_real

        # head-block masks over the (C, C) feature grid
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // d_k
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // d_k
        head_mask = (r_ids == c_ids).astype(jnp.float32)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
               ).astype(jnp.float32)

        @pl.when((l == 0) & (p == 0))
        def _():
            x_scr[pl.ds(t * tile_n, tile_n), :] = x_ref[0]

        @pl.when((p == 0) & (t == 0))
        def _():
            m_scr[:, :] = jnp.full_like(m_scr, NEG)
            s_scr[:, :] = jnp.zeros_like(s_scr)
            ctx_scr[:, :] = jnp.zeros_like(ctx_scr)

        x_bf = x_scr[pl.ds(t * tile_n, tile_n), :]    # cdt MXU operand
        x = x_bf.astype(jnp.float32)                  # residuals/LN in f32
        A = a_ref[0]
        vec = vec_ref[0]

        @pl.when(p == 0)
        def _():
            k = _dot(x_bf, A[:, c:2 * c], ((1,), (0,))) + vec[1:2, :c]
            v = _dot(x_bf, A[:, 2 * c:3 * c], ((1,), (0,))) + vec[2:3, :c]
            k = jnp.where(valid, k, NEG)
            tile_max = jnp.max(k, axis=0, keepdims=True)         # (1, C)
            m_old = m_scr[0:1, :]
            m_new = jnp.maximum(m_old, tile_max)
            rescale = jnp.exp(m_old - m_new)                     # (1, C)
            e = jnp.exp(k - m_new)
            e = jnp.where(valid, e, 0.0)
            s_scr[0:1, :] = s_scr[0:1, :] * rescale + jnp.sum(
                e, axis=0, keepdims=True)
            # ctx rows are k-features: rescale rows via diag-matmul
            diag = eye * rescale                                  # (C, C)
            ctx_scr[:, :] = _dot(diag, ctx_scr[:, :], ((1,), (0,))) + _dot(
                e.astype(cdt), v.astype(cdt), ((0,), (0,)))
            m_scr[0:1, :] = m_new

        @pl.when(p == 1)
        def _():
            q = _dot(x_bf, A[:, :c], ((1,), (0,))) + vec[0:1, :c]
            # exact per-head feature-axis softmax: static masked-max loop
            m_seg = jnp.zeros_like(q)
            for h in range(n_heads):
                lanes = jax.lax.broadcasted_iota(
                    jnp.int32, (1, c), 1) // d_k == h
                seg = jnp.where(lanes, q, NEG)
                hmax = jnp.max(seg, axis=1, keepdims=True)        # (tile, 1)
                m_seg = m_seg + jnp.where(lanes, hmax, 0.0)
            e_q = jnp.exp(q - m_seg)
            denom = _dot(e_q, head_mask, ((1,), (0,)))
            q_soft = e_q / denom * inv_sqrt_dk

            inv_s = 1.0 / s_scr[0:1, :]
            ctxn = _dot(eye * inv_s, ctx_scr[:, :], ((1,), (0,))) * head_mask
            attn = _dot(q_soft.astype(cdt),
                        ctxn.astype(cdt), ((1,), (0,)))           # (tile, C)
            o = _dot(attn.astype(cdt), A[:, 3 * c:4 * c],
                     ((1,), (0,))) + vec[3:4, :c]

            x1 = x + o
            mu = jnp.mean(x1, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(x1 - mu), axis=1, keepdims=True)
            x1 = (x1 - mu) * jax.lax.rsqrt(var + ln_eps)
            x1 = x1 * vec[6:7, :c] + vec[7:8, :c]

            h1 = _dot(x1.astype(cdt), A[:, 4 * c:6 * c],
                      ((1,), (0,))) + vec[4:5, :]
            h1 = _gelu_exact(h1)
            h2 = _dot(h1.astype(cdt), w2_ref[0],
                      ((1,), (0,))) + vec[5:6, :c]

            x2 = x1 + h2
            mu2 = jnp.mean(x2, axis=1, keepdims=True)
            var2 = jnp.mean(jnp.square(x2 - mu2), axis=1, keepdims=True)
            x2 = (x2 - mu2) * jax.lax.rsqrt(var2 + ln_eps)
            x2 = x2 * vec[8:9, :c] + vec[9:10, :c]

            x_scr[pl.ds(t * tile_n, tile_n), :] = x2.astype(x_scr.dtype)

            @pl.when(l == n_layers - 1)
            def _():
                o_ref[0] = x2.astype(o_ref.dtype)

    return kernel


def _pick_tile(n: int) -> int:
    if n >= 4096:
        return 512
    return max(64, min(512, ((n + 7) // 8) * 8))


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def fused_transformer_stack(x, A, w2, vecs, n_heads: int,
                            interpret: bool = False):
    """(B, N, C) tokens through L fused post-LN linear-attention layers.

    A/w2/vecs: stack_layer_params output. Forward-only (no VJP) — the eval
    path; training keeps the XLA/pallas_attention autodiff path.
    """
    b, n, c = x.shape
    n_layers = A.shape[0]
    tile_n = _pick_tile(n)
    n_pad = ((n + tile_n - 1) // tile_n) * tile_n
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    n_tiles = n_pad // tile_n

    # Matmul weights ride in the token dtype (the flax chain casts params
    # to the module dtype the same way). For bf16 models this also halves
    # the weight-stack VMEM (the f32 stacks pushed C=256 shapes past the
    # 16 MB scoped limit) and quadruples the MXU rate.
    A = A.astype(x.dtype)
    w2 = w2.astype(x.dtype)

    kernel = _make_kernel(n, tile_n, c, n_heads, x.dtype)

    # x is only READ at (l=0, p=0) and o only WRITTEN at the last (l, p):
    # park the block index at 0 during every other revisit so Pallas
    # doesn't stream the whole token buffer 2L times (fetches happen on
    # index CHANGE; a parked index never changes).
    def x_index(bb, l, p, t):
        return (bb, jnp.where((l == 0) & (p == 0), t, 0), 0)

    def o_index(bb, l, p, t):
        return (bb, jnp.where((l == n_layers - 1) & (p == 1), t, 0), 0)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_layers, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_n, c), x_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 6 * c), lambda bb, l, p, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c, c), lambda bb, l, p, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 2 * c), lambda bb, l, p, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, c), o_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_pad, c), x.dtype),
            pltpu.VMEM((c, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, A, w2, vecs)
    return out[:, :n, :]


def fused_stack_reference(x, A, w2, vecs, n_heads: int):
    """Pure-XLA reference of the fused stack (tests / CPU fallback).

    Mirrors the kernel's per-layer bf16 round-trip: the resident buffer is
    stored in x.dtype between layers.
    """
    b, n, c = x.shape
    d_k = c // n_heads

    def layer_norm(t, scale, bias):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return (t - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    out = x
    for l in range(A.shape[0]):
        a = A[l]
        vec = vecs[l]
        xf = out.astype(jnp.float32)
        q = xf @ a[:, :c] + vec[0, :c]
        k = xf @ a[:, c:2 * c] + vec[1, :c]
        v = xf @ a[:, 2 * c:3 * c] + vec[2, :c]

        def split(t):
            return t.reshape(b, n, n_heads, d_k).transpose(0, 2, 1, 3)

        qh = jax.nn.softmax(split(q), axis=-1) / math.sqrt(d_k)
        kh = jax.nn.softmax(split(k), axis=-2)
        ctx = jnp.einsum("bhnd,bhne->bhde", kh, split(v))
        attn = jnp.einsum("bhnd,bhde->bhne", qh, ctx)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, c)
        o = attn @ a[:, 3 * c:4 * c] + vec[3, :c]

        x1 = layer_norm(xf + o, vec[6, :c], vec[7, :c])
        h = jax.nn.gelu(x1 @ a[:, 4 * c:6 * c] + vec[4, :],
                        approximate=False)
        h2 = h @ w2[l] + vec[5, :c]
        x2 = layer_norm(x1 + h2, vec[8, :c], vec[9, :c])
        out = x2.astype(x.dtype)
    return out
