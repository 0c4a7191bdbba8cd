"""The "attn" remat policy must not change the training math.

jax.checkpoint only changes WHEN the attention/FFN intermediates are
(re)computed, never what is computed — loss and gradients must be
bit-identical (same dtype path, same ops) to the un-rematted step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lintransunet_tpu.models import MaskTransUnet, blocks


KW = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
          is_roi_list=(False, True, True), dim_input=1, dim_output=2,
          packed_levels=1, n_layers=2, dropout=0.0)


def _loss_and_grads(monkeypatch, remat):
    monkeypatch.setattr(blocks, "REMAT", remat)
    model = MaskTransUnet(**KW)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    labels = jnp.asarray((rng.random((1, 32, 32, 4)) > 0.7).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        out, mask_list = model.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)})
        total = jnp.mean((out[..., 1] - labels) ** 2)
        for m in mask_list:
            total = total + jnp.mean(m[..., 1] ** 2)
        return total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    return float(loss), jax.tree_util.tree_map(np.asarray, grads)


@pytest.mark.slow
def test_remat_attn_grads_identical(monkeypatch, rng):
    loss0, g0 = _loss_and_grads(monkeypatch, "")
    loss1, g1 = _loss_and_grads(monkeypatch, "attn")
    assert loss0 == pytest.approx(loss1, rel=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    assert len(flat0) == len(flat1)
    for (p0, a0), (p1, a1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(a0, a1, rtol=1e-5, atol=1e-7,
                                   err_msg=str(p0))


@pytest.mark.slow
def test_remat_attn_dropout_rng_identical(monkeypatch, rng):
    """Dropout masks must be drawn identically under remat (flax threads the
    rng through the checkpoint), otherwise training trajectories diverge."""
    kw = dict(KW, dropout=0.3)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    outs = []
    for remat in ("", "attn"):
        monkeypatch.setattr(blocks, "REMAT", remat)
        model = MaskTransUnet(**kw)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out, _ = jax.jit(lambda v, a: model.apply(
            v, a, train=True, rngs={"dropout": jax.random.PRNGKey(7)}))(
                variables, x)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)
