"""Loss parity vs the reference loss modules run directly in torch (CPU).

The reference's loss files import torch only, so they serve as the exact
oracle. Our losses take channels-last tensors; the oracle takes
channels-first — the fixtures produce both views of the same data.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")
from loss import criterions as ref_bin  # noqa: E402
from loss import multi_criterions as ref_multi  # noqa: E402

sys.path.pop(0)

from lintransunet_tpu.losses import binary as our_bin  # noqa: E402
from lintransunet_tpu.losses import multiclass as our_multi  # noqa: E402

# Names whose reference implementation is executable as-is (bug-free).
BINARY_PARITY = [
    "DiceLoss", "DiceClassLoss", "BalanceDiceLoss", "IOULoss", "SSLoss",
    "FocalLoss", "CrossEntroLoss", "ContainLoss", "ContainLoss2", "MSELoss",
    "Recall", "Precision", "RecallLoss", "PrecisionLoss", "LocalizationLoss",
]
MULTI_PARITY = [
    "DiceLoss", "DiceClassLoss0", "DiceClassLoss", "DiceClassLoss2",
    "BalanceDiceLoss", "BalanceDiceLoss2", "IOULoss", "FocalLoss",
    "CrossEntroLoss", "CrossEntroLoss0", "MSELoss", "Recall", "Precision",
    "Recall2", "Precision2", "RecallLoss", "PrecisionLoss",
    "LocalizationLoss", "ClassifyLoss",
]


@pytest.fixture(scope="module")
def binary_data():
    rng = np.random.default_rng(3)
    n, c, h, w, d = 2, 2, 12, 10, 6
    logits = rng.standard_normal((n, c, h, w, d)).astype(np.float32)
    e = np.exp(logits)
    prob = e / e.sum(1, keepdims=True)
    target = (rng.random((n, 1, h, w, d)) > 0.7).astype(np.int64)
    return prob, target


@pytest.fixture(scope="module")
def multi_data():
    rng = np.random.default_rng(4)
    n, c, h, w, d = 2, 3, 12, 10, 6
    logits = rng.standard_normal((n, c, h, w, d)).astype(np.float32)
    e = np.exp(logits)
    prob = e / e.sum(1, keepdims=True)
    ids = rng.integers(0, c, (n, h, w, d))
    onehot = np.eye(c, dtype=np.float32)[ids]  # (n, h, w, d, c)
    onehot_cf = onehot.transpose(0, 4, 1, 2, 3)
    return prob, onehot_cf


@pytest.mark.parametrize("name", BINARY_PARITY)
def test_binary_loss_parity(binary_data, name):
    prob_cf, target_cf = binary_data
    ref_loss = ref_bin.Loss_Dict[name]()
    with torch.no_grad():
        ref = float(ref_loss(torch.from_numpy(prob_cf),
                             torch.from_numpy(target_cf)))
    ours = our_bin.Loss_Dict[name]()
    got = float(ours(jnp.asarray(prob_cf.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(target_cf[:, 0])))
    assert got == pytest.approx(ref, rel=2e-4, abs=2e-6), name


@pytest.mark.parametrize("name", MULTI_PARITY)
def test_multi_loss_parity(multi_data, name):
    prob_cf, onehot_cf = multi_data
    ref_loss = ref_multi.Loss_Dict[name]()
    with torch.no_grad():
        ref = float(ref_loss(torch.from_numpy(prob_cf),
                             torch.from_numpy(onehot_cf)))
    ours = our_multi.Loss_Dict[name]()
    got = float(ours(jnp.asarray(prob_cf.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(onehot_cf.transpose(0, 2, 3, 4, 1))))
    assert got == pytest.approx(ref, rel=2e-4, abs=2e-6), name


def test_registry_completeness():
    assert set(our_bin.Loss_Dict) == set(ref_bin.Loss_Dict)
    assert set(our_multi.Loss_Dict) == set(ref_multi.Loss_Dict)


def test_fixed_losses_run(binary_data):
    """DistributionLoss / PyramidLoss are broken in the reference
    (stale-variable loop / invalid kwargs); ours are fixed — smoke them."""
    prob_cf, target_cf = binary_data
    p = jnp.asarray(prob_cf.transpose(0, 2, 3, 4, 1))
    t = jnp.asarray(target_cf[:, 0])
    v = float(our_bin.DistributionLoss()(p, t))
    assert np.isfinite(v) and v >= 0

    rng = np.random.default_rng(5)
    # mask_list is coarse->fine; level i is compared against the target
    # downsampled (n - i) times, so the finest mask sits at half resolution.
    masks = [jnp.asarray(rng.random((1, 16 // 2 ** (i + 1), 16 // 2 ** (i + 1), 2)).astype(np.float32))
             for i in reversed(range(3))]
    target2d = jnp.asarray((rng.random((1, 16, 16, 1)) > 0.5).astype(np.float32))
    v = float(our_bin.PyramidLoss(n=3)(masks, target2d))
    assert np.isfinite(v)


def test_unregistered_losses_run(binary_data):
    prob_cf, target_cf = binary_data
    p = jnp.asarray(prob_cf.transpose(0, 2, 3, 4, 1))
    t = jnp.asarray(target_cf[:, 0])
    assert np.isfinite(float(our_bin.RegionDiceClassLoss()(p, t)))
    assert np.isfinite(float(our_bin.MaskLoss()(p[..., 1:], t)))
    assert np.isfinite(float(our_bin.RegionCrossEntroLoss()(p, t)))
    solid_p = jnp.asarray(np.full((2, 1), 0.7, np.float32))
    assert np.isfinite(float(our_bin.SolidLoss()(solid_p, t)))
