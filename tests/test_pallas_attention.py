"""Pallas linear-attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops.attention import linear_attention
from lintransunet_tpu.ops.pallas_attention import linear_attention_pallas


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
