"""O(N) linear attention — the repo's namesake kernel.

Reference math (model/trans_block.py:41-67, per arXiv:1812.01243):

    Q' = softmax(Q, axis=-1) / sqrt(d_k)        # feature-axis softmax
    K' = softmax(K, axis=-2)                    # token-axis softmax
    context = K'^T V                            # (d_k, d_v) — tiny!
    out = Q' context                            # O(N * d^2), not O(N^2 * d)

The (d x d) context matrix is the whole trick: token count N never appears
quadratically, and sequence sharding would only need a psum of context
partials. This module provides the XLA einsum formulation (which XLA fuses
into two MXU matmuls + VPU softmaxes); a fused Pallas kernel with the same
signature lives in :mod:`lintransunet_tpu.ops.pallas_attention`.

Softmax statistics are always computed in float32 even when inputs are
bfloat16 (AMP-equivalent behaviour; torch autocast also runs softmax in fp32).
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _precision(dtype):
    """'highest' for f32 parity; native fast path for bf16 (see ops.resample)."""
    return "highest" if dtype == jnp.float32 else None


def _softmax_f32(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)


def linear_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, H, N, d) x3 -> (B, H, N, d_v).

    Matches ``linear_attention`` (trans_block.py:41-67) exactly, including
    the sqrt placement (d_model there is the *head* dim, taken from
    query.shape[-1]). ``mask`` (B, 1|H, N, 1 broadcastable), True = keep:
    masked keys are driven to -1e9 pre-softmax and masked values zeroed
    (trans_block.py:55-57).
    """
    d_k = query.shape[-1]
    q = _softmax_f32(query, axis=-1) / math.sqrt(d_k)
    if mask is not None:
        key = jnp.where(mask, key, jnp.asarray(-1e9, key.dtype))
        value = jnp.where(mask, value, jnp.zeros((), value.dtype))
    k = _softmax_f32(key, axis=-2)
    # context: (B, H, d_k, d_v) — the O(d^2) aggregation.
    prec = _precision(value.dtype)
    context = jnp.einsum("bhnd,bhne->bhde", k, value, precision=prec, optimize=True)
    return jnp.einsum("bhnd,bhde->bhne", q, context, precision=prec, optimize=True)


def softmax_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Vanilla O(N^2) attention (trans_block.py:22-39, the unused alt path).

    Kept for capability parity; scores masked with -1e9 where mask == 0.
    """
    d_k = query.shape[-1]
    prec = _precision(query.dtype)
    scores = jnp.einsum("bhnd,bhmd->bhnm", query, key, precision=prec, optimize=True) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.asarray(-1e9, scores.dtype))
    probs = _softmax_f32(scores, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, value, precision=prec, optimize=True)
