"""Model-layer tests: shapes, registry, and golden parity vs the reference.

The parity test imports the reference PyTorch model (torch-only modules, no
MONAI needed), copies its randomly-initialised weights into our flax tree via
compat.torch_import, and asserts the eval-mode forward matches to float32
tolerance — BASELINE.md's config-1 requirement.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lintransunet_tpu.compat import convert_state_dict, from_ncdhw, to_ncdhw
from lintransunet_tpu.models import MaskTransUnet, Model_Dict, get_model_dict

SMALL = dict(
    num_layers=(8, 16, 32, 32, 64),
    roi_size_list=(16, 12, 8, 6, 4),
    is_roi_list=(False, True, True, True, True),
    dim_input=1,
    dim_output=2,
)


def _init_and_run(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=train,
                      rngs={"dropout": jax.random.PRNGKey(1)} if train else None)
    return variables, out


def test_registry_names():
    assert set(Model_Dict) == {
        "TraditionUnet", "BottleTransUnet", "SkipTransUnet",
        "MaskSkipTransUnet", "MaskTransUnet",
    }
    assert get_model_dict("MaskTransUnet") is MaskTransUnet


def test_mask_trans_unet_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 8, 1)).astype(np.float32))
    model = MaskTransUnet(**SMALL)
    variables, out = _init_and_run(model, x, train=False)
    assert out.shape == (1, 64, 64, 8, 2)
    # eval branch is one-hot
    s = np.asarray(out).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-6)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}

    out_t, mask_list = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out_t.shape == (1, 64, 64, 8, 2)
    assert len(mask_list) == 4
    # coarse -> fine pyramid resolutions with alternating depth halving
    assert [m.shape[1:4] for m in mask_list] == [
        (4, 4, 4), (8, 8, 4), (16, 16, 8), (32, 32, 8)]
    assert all(m.shape[-1] == 2 for m in mask_list)


@pytest.mark.parametrize("name", ["TraditionUnet", "BottleTransUnet", "SkipTransUnet"])
def test_plain_variants_run(rng, name):
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 8, 1)).astype(np.float32))
    cls = get_model_dict(name)
    model = cls(num_layers=(8, 16, 32, 32, 64), dim_input=1, dim_output=2)
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 64, 64, 8, 2)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_mask_skip_variant_runs(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 8, 1)).astype(np.float32))
    cls = get_model_dict("MaskSkipTransUnet")
    model = cls(num_layers=(32, 32, 64, 64, 128), dim_input=1, dim_output=2)
    _, (out, mask_list) = _init_and_run(model, x)
    assert out.shape == (1, 64, 64, 8, 2)
    assert len(mask_list) == 4


@pytest.fixture(scope="module")
def reference_modules():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from model.trans_3DUnet import MaskTransUnet as TorchMaskTransUnet  # noqa
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference model unavailable: {exc}")
    finally:
        sys.path.pop(0)
    return TorchMaskTransUnet


def test_golden_parity_mask_trans_unet(reference_modules, rng):
    """Eval-mode forward parity with the reference on one small patch."""
    import torch

    TorchMaskTransUnet = reference_modules
    torch.manual_seed(0)
    tm = TorchMaskTransUnet(
        num_layers=list(SMALL["num_layers"]),
        roi_size_list=list(SMALL["roi_size_list"]),
        is_roi_list=list(SMALL["is_roi_list"]),
        dim_input=1, dim_output=2, kernel_size=3)
    tm.eval()

    x_ncdhw = rng.standard_normal((2, 1, 64, 64, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x_ncdhw)).numpy()

    model = MaskTransUnet(**SMALL)
    x = jnp.asarray(from_ncdhw(x_ncdhw))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(state, variables["params"])
    out = model.apply({"params": params}, x, train=False)
    got = to_ncdhw(out)

    # Eval output is a one-hot argmax; on a random-weight model a tiny
    # fraction of voxels can sit exactly at the decision boundary, so
    # compare both the hard output and the agreement rate.
    agreement = (got == ref).mean()
    assert agreement > 0.999, f"one-hot agreement {agreement}"


def test_golden_parity_train_probabilities(reference_modules, rng):
    """Train-branch (softmax probability) parity + deep-supervision masks."""
    import torch

    TorchMaskTransUnet = reference_modules
    torch.manual_seed(1)
    tm = TorchMaskTransUnet(
        num_layers=list(SMALL["num_layers"]),
        roi_size_list=list(SMALL["roi_size_list"]),
        is_roi_list=list(SMALL["is_roi_list"]),
        dim_input=1, dim_output=2, kernel_size=3)
    tm.eval()  # disables dropout; .training=False but we call decode directly
    tm.train(False)

    x_ncdhw = rng.standard_normal((1, 1, 64, 64, 8)).astype(np.float32)
    with torch.no_grad():
        bottle, skips = tm.encode(torch.from_numpy(x_ncdhw))
        ref_out, ref_masks = tm.decode(bottle, skips)
    ref_out = ref_out.numpy()

    model = MaskTransUnet(**SMALL)
    x = jnp.asarray(from_ncdhw(x_ncdhw))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(state, variables["params"])
    out, masks = model.apply({"params": params}, x, train=False, return_aux=True)

    np.testing.assert_allclose(to_ncdhw(out), ref_out, rtol=1e-3, atol=2e-4)
    assert len(masks) == len(ref_masks)
    for got_m, ref_m in zip(masks, ref_masks):
        np.testing.assert_allclose(
            to_ncdhw(got_m), ref_m.numpy(), rtol=1e-3, atol=2e-4)


def test_baseline_config1_forward_plus_dice_parity(reference_modules, rng):
    """BASELINE.json config 1: MaskTransUnet forward + Dice loss on one patch
    must match the reference numerically (forward through converted weights,
    DiceClassLoss on both sides)."""
    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from loss.criterions import DiceClassLoss as TorchDice
    finally:
        sys.path.pop(0)

    from lintransunet_tpu.losses.binary import DiceClassLoss

    TorchMaskTransUnet = reference_modules
    torch.manual_seed(2)
    tm = TorchMaskTransUnet(
        num_layers=list(SMALL["num_layers"]),
        roi_size_list=list(SMALL["roi_size_list"]),
        is_roi_list=list(SMALL["is_roi_list"]),
        dim_input=1, dim_output=2, kernel_size=3)
    tm.eval()

    x_ncdhw = rng.standard_normal((1, 1, 64, 64, 8)).astype(np.float32)
    label = (rng.random((1, 1, 64, 64, 8)) > 0.8).astype(np.int64)
    with torch.no_grad():
        bottle, skips = tm.encode(torch.from_numpy(x_ncdhw))
        ref_prob, _ = tm.decode(bottle, skips)
        ref_dice = float(TorchDice()(ref_prob, torch.from_numpy(label)))

    model = MaskTransUnet(**SMALL)
    x = jnp.asarray(from_ncdhw(x_ncdhw))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = convert_state_dict(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        variables["params"])
    out, _ = model.apply({"params": params}, x, train=False, return_aux=True)
    got_dice = float(DiceClassLoss()(out, jnp.asarray(label[:, 0])))

    assert got_dice == pytest.approx(ref_dice, rel=1e-4, abs=1e-5)
