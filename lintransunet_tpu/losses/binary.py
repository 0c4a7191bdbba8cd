"""Binary segmentation criterions (mirrors loss/criterions.py:1-782).

All 23 loss classes of the reference, with its 16-entry ``Loss_Dict``
registry and ``get_criterions`` factory. Losses are stateless callables:
``loss(predict, target)`` with

* ``predict``: (N, spatial..., C) softmax probabilities (channels-last)
* ``target``:  (N, spatial...) or (N, spatial..., 1) integer class ids

Reference quirks preserved (cited per class): the stacked binary one-hot,
the clamped-log weighted CE, eps placements, and the LocalizationLoss
marginal loop that only transposes on the first axis. Known reference bugs
(DistributionLoss's stale-variable loop, PyramidLoss's invalid ContainLoss
kwargs) are fixed-and-flagged since the broken forms cannot execute.
"""

import jax
import jax.numpy as jnp

from lintransunet_tpu.losses.functional import (
    binary_onehot,
    flatten_labels,
    flatten_tokens,
    one_hot,
)

Array = jnp.ndarray


class DiceLoss:
    """Mean per-class dice over the stacked binary one-hot (criterions.py:8-32)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)
        t = binary_onehot(flatten_labels(target))
        cross = 2 * jnp.sum(p * t, axis=1) + self.eps
        total = jnp.sum(p + t, axis=1) + self.eps
        return 1.0 - jnp.mean(cross / total)


class DiceClassLoss:
    """Dice of one class channel against the raw label (criterions.py:35-70)."""

    def __init__(self, class_index: int = 1, eps: float = 1e-9):
        self.class_index = class_index
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)[:, :, self.class_index]
        t = flatten_labels(target)
        cross = 2 * jnp.sum(p * t, axis=-1) + self.eps
        total = jnp.sum(p + t, axis=-1) + self.eps
        return 1.0 - jnp.mean(cross / total)


class RegionDiceClassLoss:
    """Half-weighted asymmetric dice (criterions.py:73-116, dist path disabled)."""

    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        self.class_index = class_index
        self.eps = eps

    def __call__(self, predict: Array, target: Array, dist=None,
                 surface_distance=None) -> Array:
        p = flatten_tokens(predict)[:, :, self.class_index]
        t = flatten_labels(target)
        w = 0.5
        cross = jnp.sum(p * t, axis=-1) + self.eps
        total = jnp.sum(w * p + (1 - w) * t, axis=-1) + self.eps
        return 1.0 - jnp.mean(cross / total)


def _cdf_l1(pred_marginal: Array, target_marginal: Array, eps: float,
            scale: float = 1.0) -> Array:
    """Cumulative-marginal L1 (dis_loss, criterions.py:165-176, 230-241)."""
    dp = jnp.cumsum(pred_marginal, axis=-1) / (
        jnp.sum(pred_marginal, axis=-1, keepdims=True) + eps)
    dt = jnp.cumsum(target_marginal, axis=-1) / (
        jnp.sum(target_marginal, axis=-1, keepdims=True) + eps)
    return scale * jnp.mean(jnp.abs(dp - dt))


def _axis_marginals(x: Array):
    """Per-spatial-axis marginals of (N, spatial..., 1)-like channel maps.

    x: (N, S0, S1, S2, 1). Returns [(N, 1, S_i)] summing the other axes.
    """
    n_dim = x.ndim - 2
    outs = []
    for i in range(n_dim):
        axes = tuple(j + 1 for j in range(n_dim) if j != i) + (x.ndim - 1,)
        outs.append(jnp.sum(x, axis=axes)[:, None, :])
    return outs


class DistributionLoss:
    """Axis-marginal CDF matching (criterions.py:119-176).

    The reference loop reuses a stale ``dim_predict`` for axes > 0 (lines
    144-156), which is a bug its own live paths never execute. Fixed here:
    each spatial axis contributes its own marginal, which is the evident
    intent of the transpose at line 149.
    """

    def __init__(self, class_index: int = 1, eps: float = 1e-7):
        self.class_index = class_index
        self.eps = eps
        self.mask_threshold = 0.5
        self.mask_region = 0.05

    def __call__(self, predict: Array, target: Array) -> Array:
        p = jax.nn.sigmoid(
            (predict.astype(jnp.float32) - self.mask_threshold) / self.mask_region)
        p = p[..., self.class_index:self.class_index + 1]
        t = target.astype(jnp.float32)
        if t.shape[-1] != 1 or t.ndim == p.ndim - 1:
            t = t[..., None]
        losses = [
            _cdf_l1(pm, tm, self.eps)
            for pm, tm in zip(_axis_marginals(p), _axis_marginals(t))
        ]
        return sum(losses) / len(losses)


class LocalizationLoss:
    """Sigmoid-thresholded marginal CDF loss (criterions.py:179-241).

    Faithful quirk: the reference only transposes the axis on iteration 0
    (lines 204-213), so every iteration computes the *first-axis* marginal
    — all three terms are identical. Replicated exactly (computed once).
    """

    def __init__(self, class_index: int = 1, eps: float = 1e-6):
        self.class_index = class_index
        self.eps = eps
        self.mask_threshold = 10.0

    def __call__(self, predict: Array, target: Array) -> Array:
        p = predict.astype(jnp.float32)[..., self.class_index:self.class_index + 1]
        t = target.astype(jnp.float32)
        if t.ndim == p.ndim - 1:
            t = t[..., None]
        pm = _axis_marginals(p)[0]
        tm = _axis_marginals(t)[0]
        pm = jax.nn.sigmoid(pm - self.mask_threshold)
        tm = jax.nn.sigmoid(tm - self.mask_threshold)
        # 3 identical axis terms averaged == single term (scale 8, line 240).
        return _cdf_l1(pm, tm, self.eps, scale=8.0)


class MaskLoss:
    """Dice over a single-channel mask (criterions.py:244-277)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)[..., 0]
        t = flatten_labels(target)
        cross = 2 * jnp.sum(p * t, axis=-1) + self.eps
        total = jnp.sum(p + t, axis=-1) + self.eps
        return 1.0 - jnp.mean(cross / total)


class _ClassRatio:
    """Shared recall/precision skeleton (criterions.py:280-413)."""

    def __init__(self, class_index: int = 1, eps: float = 1e-5,
                 denom: str = "target", complement: bool = False):
        self.class_index = class_index
        self.eps = eps
        self.denom = denom
        self.complement = complement

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)[:, :, self.class_index]
        t = flatten_labels(target)
        cross = jnp.sum(p * t, axis=-1) + self.eps
        denom = jnp.sum(t if self.denom == "target" else p, axis=-1) + self.eps
        value = jnp.mean(cross / denom)
        return 1.0 - value if self.complement else value


class Recall(_ClassRatio):
    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        super().__init__(class_index, eps, denom="target", complement=False)


class RecallLoss(_ClassRatio):
    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        super().__init__(class_index, eps, denom="target", complement=True)


class Precision(_ClassRatio):
    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        super().__init__(class_index, eps, denom="predict", complement=False)


class PrecisionLoss(_ClassRatio):
    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        super().__init__(class_index, eps, denom="predict", complement=True)


class BalanceDiceLoss:
    """Inverse-square class-frequency weighted dice (criterions.py:416-442)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)
        t = binary_onehot(flatten_labels(target))
        w = 1.0 / (jnp.sum(t, axis=1, keepdims=True) + self.eps) ** 2
        cross = 2 * jnp.sum(p * t * w, axis=(1, 2)) + self.eps
        total = jnp.sum((p + t) * w, axis=(1, 2)) + self.eps
        return 1.0 - jnp.mean(cross / total)


class SolidLoss:
    """BCE on volume solidity (target voxel count > threshold), criterions.py:445-463."""

    def __init__(self, threshold: float = 10.0):
        self.threshold = threshold

    def __call__(self, predict: Array, target: Array) -> Array:
        t = flatten_labels(target)
        solid = (jnp.sum(t, axis=-1) > self.threshold).astype(jnp.float32)
        solid = solid[:, None]
        p = predict.astype(jnp.float32)
        return jnp.mean(-(solid * jnp.log(p) + (1 - solid) * jnp.log(1 - p)))


class ContainLoss:
    """Asymmetric containment dice (criterions.py:466-497), alpha=0.4."""

    default_alpha = 0.4

    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        self.class_index = class_index
        self.eps = eps

    def __call__(self, predict: Array, target: Array, alpha: float = None) -> Array:
        if alpha is None:
            alpha = self.default_alpha
        p = flatten_tokens(predict)[:, :, self.class_index]
        t = flatten_labels(target)
        cross = jnp.sum(p * t, axis=-1) + self.eps
        st = jnp.sum(t, axis=-1) + self.eps
        sp = jnp.sum(p, axis=-1) + self.eps
        return 1.0 - jnp.mean(cross / ((1 - alpha) * st + alpha * sp))


class ContainLoss2(ContainLoss):
    """ContainLoss with alpha=0.3 (criterions.py:499-529)."""

    default_alpha = 0.3


class PyramidLoss:
    """Multi-scale containment loss over a mask pyramid (criterions.py:533-560).

    The reference constructs ContainLoss with an ``alpha`` kwarg its
    __init__ does not accept (line 543) — it cannot instantiate. Fixed:
    alpha = 0.2*(i+1)/n is passed at call time. Operates on 2D mask lists
    (N, H, W, C); downsampling is 5x5 avg-pool stride 2.
    """

    def __init__(self, n: int = 3):
        self.n = n
        self.kernel_size = 5
        self.threshold = 0.2
        self.contain = [ContainLoss(class_index=1) for _ in range(n)]
        self.alphas = [0.2 * (i + 1) / n for i in range(n)]

    def __call__(self, mask_list, target: Array) -> Array:
        from lintransunet_tpu.ops import avg_pool2d

        t = target.astype(jnp.float32)
        losses = []
        for i in range(self.n):
            t = avg_pool2d(t, self.kernel_size, 2, self.kernel_size // 2)
            label = (t > self.threshold).astype(jnp.float32)
            losses.append(
                self.contain[-i - 1](mask_list[-i - 1], label[..., 0],
                                     alpha=self.alphas[-i - 1]))
        return sum(losses) / self.n


class IOULoss:
    """IoU loss over true one-hot targets (criterions.py:563-585)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)
        t = one_hot(flatten_labels(target), p.shape[-1])
        cross = jnp.sum(p * t, axis=1) + self.eps
        total = jnp.sum(p + t, axis=1) + self.eps
        return 1.0 - jnp.mean(cross / (total - cross))


class SSLoss:
    """Sensitivity-specificity loss, sigma=0.05 (criterions.py:588-615)."""

    def __init__(self, sigma: float = 0.05, eps: float = 1e-5):
        self.sigma = sigma
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)
        t = one_hot(flatten_labels(target), p.shape[-1])
        l2 = (p - t) ** 2
        sens = jnp.sum(l2 * t, axis=1) / (jnp.sum(t, axis=1) + self.eps)
        spec = jnp.sum(l2 * (1 - t), axis=1) / (jnp.sum(1 - t, axis=1) + self.eps)
        return jnp.mean(self.sigma * sens + (1 - self.sigma) * spec)


class FocalLoss:
    """Focal loss, gamma=2 (criterions.py:618-644). Unclamped log, faithful."""

    def __init__(self, gamma: float = 2.0, eps: float = 1e-9):
        self.gamma = gamma
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)
        t = one_hot(flatten_labels(target), p.shape[-1])
        cross = -((1 - p) ** self.gamma) * t * jnp.log(p)
        return jnp.mean(cross)


class RegionCrossEntroLoss:
    """Plain CE with eps-shifted log (criterions.py:647-693, dist path disabled)."""

    def __init__(self, eps: float = 1e-9):
        self.eps = eps

    def __call__(self, predict: Array, target: Array, dist=None,
                 surface_distance=None) -> Array:
        p = flatten_tokens(predict)
        t = one_hot(flatten_labels(target), p.shape[-1])
        return jnp.mean(-t * jnp.log(p + self.eps))


class CrossEntroLoss:
    """The reference's custom weighted CE (criterions.py:696-735).

    weight_c = (S - sum_tokens p_c) / S per class (down-weights classes the
    model already predicts a lot of); (1 - p) modulation; log clamped at
    1e-6. S enters through the one-hot total (line 717).
    """

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)
        t = binary_onehot(flatten_labels(target))
        logp = jnp.log(jnp.clip(p, min=1e-6))
        weight = jnp.sum(p, axis=1, keepdims=True) + self.eps  # (N, 1, C)
        total = jnp.sum(t, axis=(1, 2), keepdims=True)  # (N, 1, 1) == S
        weight = (total - weight) / total
        return jnp.mean(-weight * (1 - p) * t * logp)


class MSEcLoss:
    """MSE vs true one-hot (criterions.py:738-752)."""

    def __init__(self, reduction: str = "mean"):
        assert reduction == "mean"

    def __call__(self, predict: Array, target: Array) -> Array:
        p = flatten_tokens(predict)
        t = one_hot(flatten_labels(target), p.shape[-1])
        return jnp.mean((p - t) ** 2)


Loss_Dict = {
    "DiceLoss": DiceLoss,
    "DiceClassLoss": DiceClassLoss,
    "BalanceDiceLoss": BalanceDiceLoss,
    "IOULoss": IOULoss,
    "SSLoss": SSLoss,
    "FocalLoss": FocalLoss,
    "CrossEntroLoss": CrossEntroLoss,
    "ContainLoss": ContainLoss,
    "ContainLoss2": ContainLoss2,
    "MSELoss": MSEcLoss,
    "Recall": Recall,
    "Precision": Precision,
    "RecallLoss": RecallLoss,
    "PrecisionLoss": PrecisionLoss,
    "DistributionLoss": DistributionLoss,
    "LocalizationLoss": LocalizationLoss,
}


def get_criterions(name_list):
    """Name list -> {name: loss callable} (criterions.py:773-782)."""
    return {name: Loss_Dict[name]() for name in name_list}
