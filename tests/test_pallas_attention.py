"""Pallas linear-attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops.attention import linear_attention
from lintransunet_tpu.ops.pallas_attention import linear_attention_pallas
import pytest


def test_pallas_matches_xla_interpret(rng):
    b, h, n, d = 2, 4, 300, 32  # n not a lane multiple: exercises padding
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
               for _ in range(3))
    ref = linear_attention(q, k, v)
    got = linear_attention_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_rectangular_dv(rng):
    b, h, n, dk = 1, 2, 128, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, dk)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dk)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dk)).astype(np.float32))
    ref = linear_attention(q, k, v)
    got = linear_attention_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_gradients_match_xla(rng):
    import jax

    b, h, n, d = 1, 2, 64, 16
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
               for _ in range(3))
    tangent = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(linear_attention(q, k, v) * tangent)

    def loss_pallas(q, k, v):
        return jnp.sum(linear_attention_pallas(q, k, v, True) * tangent)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_tiled_linear_attention_matches_einsum(rng, monkeypatch):
    """The token-tiled two-pass path must match the XLA einsum reference."""
    from lintransunet_tpu.ops import pallas_attention as pa
    from lintransunet_tpu.ops.attention import linear_attention

    monkeypatch.setattr(pa, "WHOLE_N_LIMIT", 512)
    monkeypatch.setattr(pa, "TILE_N", 256)

    n = 1000  # > limit, pads to 1024 = 4 tiles
    q = jnp.asarray(rng.standard_normal((1, 2, n, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, n, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, n, 16)).astype(np.float32))
    ref = linear_attention(q, k, v)
    got = pa.linear_attention_pallas(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_tiled_path_gradients(rng, monkeypatch):
    """Custom VJP must keep working when the forward takes the tiled path."""
    from lintransunet_tpu.ops import pallas_attention as pa
    from lintransunet_tpu.ops.attention import linear_attention

    monkeypatch.setattr(pa, "WHOLE_N_LIMIT", 256)
    monkeypatch.setattr(pa, "TILE_N", 128)

    n = 300
    q = jnp.asarray(rng.standard_normal((1, 1, n, 8)).astype(np.float32))

    def loss_pl(q):
        return jnp.sum(pa.linear_attention_pallas(q, q, q, True) ** 2)

    def loss_ref(q):
        return jnp.sum(linear_attention(q, q, q) ** 2)

    g_pl = jax.grad(loss_pl)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)
