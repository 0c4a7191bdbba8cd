"""Fused transformer-stack kernel (ops/pallas_layer.py) vs the flax oracle.

The kernel runs in interpreter mode on the CPU test platform; on TPU the
same pallas_call compiles natively and the model blocks route eval forwards
through it (models/blocks.py:_fused_layer_stack)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lintransunet_tpu.models.blocks import SelfAttentionLayer
from lintransunet_tpu.ops.pallas_layer import (
    fused_stack_reference,
    fused_transformer_stack,
    stack_layer_params,
)


def _stack(C, NH, L, N, B, dt, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32).astype(dt)
    layers = [SelfAttentionLayer(C, NH, 2 * C, 0.1, dtype=dt)
              for _ in range(L)]
    params = []
    key = jax.random.PRNGKey(seed)
    for lyr in layers:
        key, k = jax.random.split(key)
        params.append(lyr.init(k, x)["params"])
    out = x
    for lyr, p in zip(layers, params):
        out = lyr.apply({"params": p}, out, train=False)
    return x, params, out


@pytest.mark.parametrize("C,NH,L,N,B,dt", [
    (128, 4, 2, 700, 2, jnp.float32),   # unaligned N (pad-row masking)
    (256, 8, 2, 512, 1, jnp.bfloat16),  # flagship bottleneck shape class
    (128, 4, 1, 64, 3, jnp.bfloat16),   # single layer, tiny N, batch 3
])
@pytest.mark.slow
def test_fused_stack_matches_flax(C, NH, L, N, B, dt):
    x, params, oracle = _stack(C, NH, L, N, B, dt)
    A, w2, vecs = stack_layer_params(params)
    fused = fused_transformer_stack(x, A, w2, vecs, NH, interpret=True)
    got = fused.astype(jnp.float32)
    want = oracle.astype(jnp.float32)
    tol = 2e-5 if dt == jnp.float32 else 0.06  # bf16: kernel is f32-internal
    assert float(jnp.max(jnp.abs(got - want))) < tol


@pytest.mark.slow
def test_fused_stack_xla_reference_matches_flax():
    x, params, oracle = _stack(128, 4, 3, 300, 1, jnp.float32)
    A, w2, vecs = stack_layer_params(params)
    ref = fused_stack_reference(x, A, w2, vecs, 4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(oracle),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_fused_routing_preserves_param_names(monkeypatch):
    """Force the fused routing on (interpret via monkeypatched call) and
    check EmbedAttention3DBlock produces the same result as unfused."""
    from lintransunet_tpu.models import blocks as B
    from lintransunet_tpu.ops import pallas_layer as pll

    # route through the kernel in interpret mode on CPU
    monkeypatch.setattr(
        pll, "fused_stack_supported", lambda d, h, n=None: True)
    orig = pll.fused_transformer_stack
    monkeypatch.setattr(
        pll, "fused_transformer_stack",
        lambda x, a, w2, v, nh, interpret=False: orig(
            x, a, w2, v, nh, interpret=True))

    blk = B.EmbedAttention3DBlock(in_dim=8, d_model=128, nhead=4,
                                  dropout=0.1, n_layers=2,
                                  dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 6, 4, 8)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x, train=False)
    fused_out = blk.apply(params, x, train=False)

    monkeypatch.setattr(pll, "fused_stack_supported",
                        lambda d, h, n=None: False)
    plain_out = blk.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(fused_out), np.asarray(plain_out),
                               atol=2e-5, rtol=2e-5)
