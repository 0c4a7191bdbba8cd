"""Fused Pallas TPU kernel for O(N) linear attention.

One kernel per (batch*head) slice fuses the whole chain of
trans_block.py:41-67 — feature-axis softmax on Q, token-axis softmax on K,
the (d x d) context aggregation, and the output matmul — into a single VMEM
round trip. The XLA einsum path (ops.attention.linear_attention) materialises
softmax(Q), softmax(K) and the context in HBM; at the model's token counts
(1k-45k, d_k = 32) the op is bandwidth-bound, so fusing removes ~3 full
tensor round trips.

Layout: operands are transposed to (BH, d, N) so the long token axis sits on
the 128-wide lane dimension and d=32 rides the sublanes — (N, d) layout
would waste 3/4 of every vector register on lane padding.

Padding: N is padded to a lane multiple with K = -1e9 (softmax weight ~0)
and V = Q = 0, matching the reference's mask convention
(trans_block.py:55-57).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def pallas_supported() -> bool:
    """Explicit capability probe for the fused TPU kernel.

    Only TPU-family backends (incl. the axon tunnel) can run the Mosaic
    kernel; a GPU backend must NOT be routed here just because it isn't
    "cpu". ``LINTRANSUNET_USE_PALLAS=0/1`` force-overrides for experiments.
    """
    import os

    override = os.environ.get("LINTRANSUNET_USE_PALLAS")
    if override is not None:
        return override not in ("0", "false", "False")
    return jax.default_backend() in ("tpu", "axon")


def _kernel(q_ref, k_ref, v_ref, o_ref):
    """q/k/v refs: (1, d, N) blocks in VMEM; o: (1, d_v, N)."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d_k = q.shape[0]

    # Token-axis softmax on K: per feature row, over N (the lane axis).
    k_max = jnp.max(k, axis=1, keepdims=True)
    k_exp = jnp.exp(k - k_max)
    k_sum = jnp.sum(k_exp, axis=1, keepdims=True)
    k_soft = k_exp / k_sum

    # context[d_k, d_v] = sum_n k_soft[d_k, n] * v[d_v, n]
    context = jax.lax.dot_general(
        k_soft, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # Feature-axis softmax on Q: per token column, over d (sublane axis).
    q_max = jnp.max(q, axis=0, keepdims=True)
    q_exp = jnp.exp(q - q_max)
    q_soft = q_exp / jnp.sum(q_exp, axis=0, keepdims=True)
    q_soft = q_soft * (1.0 / math.sqrt(d_k))

    # out[d_v, n] = sum_dk context[d_k, d_v] * q_soft[d_k, n]
    out = jax.lax.dot_general(
        context, q_soft, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear_attention_pallas(query, key, value, interpret: bool = False):
    """(B, H, N, d) x3 -> (B, H, N, d_v); semantics == ops.linear_attention.

    Differentiable: the forward runs the fused Pallas kernel; the backward
    is the analytic gradient of the linear-attention chain expressed as XLA
    einsums (pallas_call itself has no autodiff rule).

    No mask parameter: the live reference paths never pass one
    (Unet_3Dblock.py:746, 266); use the XLA path for masked capability.
    """
    return _forward(query, key, value, interpret)


# Above ~16k tokens the whole-N kernel's f32 working set approaches the
# 16 MB VMEM limit (measured OOM at 28.8k tokens x batch 5); the token-tiled
# two-pass path below has O(TILE_N) VMEM instead.
WHOLE_N_LIMIT = 16384
TILE_N = 4096


@functools.partial(jax.jit, static_argnames=("interpret",))
def _forward(query, key, value, interpret: bool = False):
    b, h, n, d = query.shape
    d_v = value.shape[-1]
    bh = b * h

    tiled = n > WHOLE_N_LIMIT
    align = TILE_N if tiled else LANE

    def to_dn(t):
        t = t.reshape(bh, n, t.shape[-1]).swapaxes(1, 2)  # (BH, d, N)
        pad_n = (-n) % align
        if pad_n:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, pad_n)))
        return t

    qt, vt = to_dn(query), to_dn(value)
    kt = key.reshape(bh, n, d).swapaxes(1, 2)
    pad_n = (-n) % align
    if pad_n:
        # padded K tokens get -1e9 so their softmax weight vanishes
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_n)),
                     constant_values=-1e9)
    n_pad = n + pad_n

    if tiled:
        out = _tiled_call(qt, kt, vt, interpret)
    else:
        out = pl.pallas_call(
            _kernel,
            grid=(bh,),
            in_specs=[
                pl.BlockSpec((1, d, n_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, n_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_v, n_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, d_v, n_pad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, d_v, n_pad), query.dtype),
            interpret=interpret,
        )(qt, kt, vt)

    out = out[:, :, :n].swapaxes(1, 2).reshape(b, h, n, d_v)
    return out


def _stats_kernel(k_ref, v_ref, ctx_ref, s_ref,
                  m_scr, s_scr, ctx_scr):
    """Pass 1, sequential over token tiles: online token-axis softmax stats
    for K plus the rescaled context accumulation.

    k/v refs: (1, d, TILE_N); outputs (written at the last tile):
    ctx (1, d, d_v) f32, s (1, d, LANE) f32 (stat broadcast over lanes).
    The running max lives purely in scratch — pass 2 only needs ctx/s.
    """
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    tile_max = jnp.max(k, axis=1, keepdims=True)              # (d, 1)

    @pl.when(t == 0)
    def _():
        m_scr[:, :] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:, :] = jnp.zeros_like(s_scr)
        ctx_scr[:, :] = jnp.zeros_like(ctx_scr)

    m_old = m_scr[:, 0:1]
    m_new = jnp.maximum(m_old, tile_max)
    rescale = jnp.exp(m_old - m_new)                          # (d, 1)
    e = jnp.exp(k - m_new)                                    # (d, TILE_N)
    s_scr[:, :] = s_scr[:, :] * rescale + jnp.sum(
        e, axis=1, keepdims=True)
    ctx_scr[:, :] = ctx_scr[:, :] * rescale + jax.lax.dot_general(
        e, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:, :] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(t == n_tiles - 1)
    def _():
        ctx_ref[0] = ctx_scr[:, :]
        s_ref[0] = jnp.broadcast_to(s_scr[:, 0:1], s_ref.shape[1:])


def _out_kernel(q_ref, ctx_ref, s_ref, o_ref):
    """Pass 2, parallel over tiles: out = (ctx/s)^T @ softmax_d(Q)/sqrt(d)."""
    q = q_ref[0].astype(jnp.float32)
    d_k = q.shape[0]
    q_max = jnp.max(q, axis=0, keepdims=True)
    q_exp = jnp.exp(q - q_max)
    q_soft = q_exp / jnp.sum(q_exp, axis=0, keepdims=True)
    q_soft = q_soft * (1.0 / math.sqrt(d_k))
    ctx = ctx_ref[0] / s_ref[0][:, 0:1]
    out = jax.lax.dot_general(
        ctx, q_soft, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _tiled_call(qt, kt, vt, interpret):
    bh, d, n_pad = qt.shape
    d_v = vt.shape[1]
    n_tiles = n_pad // TILE_N

    ctx, s = pl.pallas_call(
        _stats_kernel,
        grid=(bh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, d, TILE_N), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_v, TILE_N), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d, d_v), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, LANE), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, d, d_v), jnp.float32),
            jax.ShapeDtypeStruct((bh, d, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, LANE), jnp.float32),
            pltpu.VMEM((d, LANE), jnp.float32),
            pltpu.VMEM((d, d_v), jnp.float32),
        ],
        interpret=interpret,
    )(kt, vt)

    return pl.pallas_call(
        _out_kernel,
        grid=(bh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, d, TILE_N), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d_v), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, LANE), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_v, TILE_N), lambda i, t: (i, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d_v, n_pad), qt.dtype),
        interpret=interpret,
    )(qt, ctx, s)


def _fwd(query, key, value, interpret: bool = False):
    return _forward(query, key, value, interpret), (query, key, value)


def _softmax_bwd(s, g):
    """VJP of softmax along the axis s was normalised over (last here)."""
    return s * (g - jnp.sum(g * s, axis=-1, keepdims=True))


def _bwd(interpret, residuals, g):
    """Analytic gradients of out = (softmax_d(Q)/sqrt(d)) @ (softmax_n(K)^T V).

    Softmaxes are recomputed (cheap, O(N d)); all contractions are the same
    O(N d^2) shape as the forward.
    """
    q, k, v = residuals
    d_k = q.shape[-1]
    scale = 1.0 / math.sqrt(d_k)
    g32 = g.astype(jnp.float32)

    s_q = jax.nn.softmax(q.astype(jnp.float32), axis=-1)
    s_k = jax.nn.softmax(k.astype(jnp.float32), axis=-2)
    v32 = v.astype(jnp.float32)

    context = jnp.einsum("bhnd,bhne->bhde", s_k, v32)        # (B,H,dk,dv)
    dq_prime = jnp.einsum("bhne,bhde->bhnd", g32, context)    # dL/d(Q')
    dq = _softmax_bwd(s_q, dq_prime * scale)

    q_prime = s_q * scale
    d_context = jnp.einsum("bhnd,bhne->bhde", q_prime, g32)   # (B,H,dk,dv)
    dk_prime = jnp.einsum("bhne,bhde->bhnd", v32, d_context)  # dL/d(K')
    # softmax over the token axis: transpose trick reuses the last-axis bwd
    dk = _softmax_bwd(s_k.swapaxes(-1, -2),
                      dk_prime.swapaxes(-1, -2)).swapaxes(-1, -2)
    dv = jnp.einsum("bhnd,bhde->bhne", s_k, d_context)

    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


linear_attention_pallas.defvjp(_fwd, _bwd)
