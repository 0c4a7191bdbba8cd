"""Multi-class criterions (mirrors loss/multi_criterions.py:1-713).

Same registry names and math as the reference's 20-entry multi-class
``Loss_Dict``. These take ONE-HOT targets:

* ``predict``: (N, spatial..., C) softmax probabilities
* ``target``:  (N, spatial..., C) one-hot labels

(the reference builds the one-hot on device in its train loops,
utils/utils_3D_multi_class.py:67-76).
"""

import jax
import jax.numpy as jnp

from lintransunet_tpu.losses import binary as _binary
from lintransunet_tpu.losses.functional import flatten_tokens

Array = jnp.ndarray


def _pair(predict: Array, target: Array):
    return flatten_tokens(predict), flatten_tokens(target)


class DiceLoss:
    """(multi_criterions.py:8-28)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        cross = 2 * jnp.sum(p * t, axis=1) + self.eps
        total = jnp.sum(p + t, axis=1) + self.eps
        return 1.0 - jnp.mean(cross / total)


class _DiceClass:
    def __init__(self, class_index: int, eps: float = 1e-9):
        self.class_index = class_index
        self.eps = eps

    def _select(self, x: Array) -> Array:
        return x[:, :, self.class_index]

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        cp, ct = self._select(p), self._select(t)
        cross = 2 * jnp.sum(cp * ct, axis=-1) + self.eps
        total = jnp.sum(cp + ct, axis=-1) + self.eps
        return 1.0 - jnp.mean(cross / total)


class DiceClassLoss0(_DiceClass):
    """Foreground-union dice: 1 - channel 0 (multi_criterions.py:30-55)."""

    def __init__(self, class_index: int = 0, eps: float = 1e-9):
        super().__init__(class_index, eps)

    def _select(self, x: Array) -> Array:
        return 1.0 - x[:, :, 0]


class DiceClassLoss(_DiceClass):
    """(multi_criterions.py:58-83)."""

    def __init__(self, class_index: int = 1, eps: float = 1e-9):
        super().__init__(class_index, eps)


class DiceClassLoss2(_DiceClass):
    """(multi_criterions.py:85-110)."""

    def __init__(self, class_index: int = 2, eps: float = 1e-9):
        super().__init__(class_index, eps)


# Raw-label variants reused verbatim from the binary module (the reference's
# multi-class file re-declares them identically):
RegionDiceClassLoss = _binary.RegionDiceClassLoss
DistributionLoss = _binary.DistributionLoss
MaskLoss = _binary.MaskLoss


class LocalizationLoss:
    """Foreground (1 - p0) marginal CDF loss (multi_criterions.py:219-281).

    Differs from the binary variant: operates on 1 - channel0 for both
    predict and target, and dis_loss has no 8x scale (line 280). The
    only-first-axis-transposed loop quirk is identical.
    """

    def __init__(self, class_index: int = 1, eps: float = 1e-6):
        self.class_index = class_index
        self.eps = eps
        self.mask_threshold = 10.0

    def __call__(self, predict: Array, target: Array) -> Array:
        p = (1.0 - predict.astype(jnp.float32)[..., 0])[..., None]
        t = (1.0 - target.astype(jnp.float32)[..., 0])[..., None]
        pm = _binary._axis_marginals(p)[0]
        tm = _binary._axis_marginals(t)[0]
        pm = jax.nn.sigmoid(pm - self.mask_threshold)
        tm = jax.nn.sigmoid(tm - self.mask_threshold)
        return _binary._cdf_l1(pm, tm, self.eps, scale=1.0)


class _ClassRatioOneHot:
    """Recall/precision over one-hot targets (multi_criterions.py:320-490)."""

    def __init__(self, class_index: int, eps: float = 1e-5,
                 denom: str = "target", complement: bool = False):
        self.class_index = class_index
        self.eps = eps
        self.denom = denom
        self.complement = complement

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        cp, ct = p[:, :, self.class_index], t[:, :, self.class_index]
        cross = jnp.sum(cp * ct, axis=-1) + self.eps
        denom = jnp.sum(ct if self.denom == "target" else cp, axis=-1) + self.eps
        value = jnp.mean(cross / denom)
        return 1.0 - value if self.complement else value


class Recall(_ClassRatioOneHot):
    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        super().__init__(class_index, eps, "target", False)


class Recall2(_ClassRatioOneHot):
    def __init__(self, class_index: int = 2, eps: float = 1e-5):
        super().__init__(class_index, eps, "target", False)


class RecallLoss(_ClassRatioOneHot):
    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        super().__init__(class_index, eps, "target", True)


class Precision(_ClassRatioOneHot):
    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        super().__init__(class_index, eps, "predict", False)


class Precision2(_ClassRatioOneHot):
    def __init__(self, class_index: int = 2, eps: float = 1e-5):
        super().__init__(class_index, eps, "predict", False)


class PrecisionLoss(_ClassRatioOneHot):
    def __init__(self, class_index: int = 1, eps: float = 1e-5):
        super().__init__(class_index, eps, "predict", True)


class BalanceDiceLoss:
    """(multi_criterions.py:493-515)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        w = 1.0 / (jnp.sum(t, axis=1, keepdims=True) + self.eps) ** 2
        cross = 2 * jnp.sum(p * t * w, axis=(1, 2)) + self.eps
        total = jnp.sum((p + t) * w, axis=(1, 2)) + self.eps
        return 1.0 - jnp.mean(cross / total)


class BalanceDiceLoss2(BalanceDiceLoss):
    """Background-excluding balanced dice (multi_criterions.py:517-541)."""

    def __call__(self, predict: Array, target: Array) -> Array:
        return super().__call__(predict[..., 1:], target[..., 1:])


class IOULoss:
    """(multi_criterions.py:544-564)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        cross = jnp.sum(p * t, axis=1) + self.eps
        total = jnp.sum(p + t, axis=1) + self.eps
        return 1.0 - jnp.mean(cross / (total - cross))


class FocalLoss:
    """(multi_criterions.py:568-591)."""

    def __init__(self, gamma: float = 2.0, eps: float = 1e-9):
        self.gamma = gamma
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        return jnp.mean(-((1 - p) ** self.gamma) * t * jnp.log(p))


class CrossEntroLoss:
    """One-hot-target port of the custom weighted CE (multi_criterions.py:594-615)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        logp = jnp.log(jnp.clip(p, min=1e-6))
        weight = jnp.sum(p, axis=1, keepdims=True) + self.eps
        total = jnp.sum(t, axis=(1, 2), keepdims=True)
        weight = (total - weight) / total
        return jnp.mean(-weight * (1 - p) * t * logp)


class ClassifyLoss:
    """Expected-class MSE over foreground voxels (multi_criterions.py:617-636)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        c = p.shape[-1]
        weights = jnp.arange(c, dtype=jnp.float32)[None, None, :]
        tc = jnp.sum(weights * t, axis=-1)
        pc = jnp.sum(weights * p, axis=-1)
        fg = 1.0 - t[:, :, 0]
        return jnp.sum(fg * (pc - tc) ** 2) / (jnp.sum(fg) + self.eps)


class CrossEntroLoss0:
    """Background-vs-rest weighted CE (multi_criterions.py:640-663)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        p2 = jnp.stack([p[:, :, 0], 1 - p[:, :, 0]], axis=-1)
        t2 = jnp.stack([t[:, :, 0], 1 - t[:, :, 0]], axis=-1)
        logp = jnp.log(jnp.clip(p2, min=1e-6))
        weight = jnp.sum(p2, axis=1, keepdims=True) + self.eps
        total = jnp.sum(t2, axis=(1, 2), keepdims=True)
        weight = (total - weight) / total
        return jnp.mean(-weight * (1 - p2) * t2 * logp)


class MSEcLoss:
    """(multi_criterions.py:666-679)."""

    def __init__(self, reduction: str = "mean"):
        assert reduction == "mean"

    def __call__(self, predict: Array, target: Array) -> Array:
        p, t = _pair(predict, target)
        return jnp.mean((p - t) ** 2)


Loss_Dict = {
    "DiceLoss": DiceLoss,
    "DiceClassLoss0": DiceClassLoss0,
    "DiceClassLoss": DiceClassLoss,
    "DiceClassLoss2": DiceClassLoss2,
    "BalanceDiceLoss": BalanceDiceLoss,
    "BalanceDiceLoss2": BalanceDiceLoss2,
    "IOULoss": IOULoss,
    "FocalLoss": FocalLoss,
    "CrossEntroLoss": CrossEntroLoss,
    "CrossEntroLoss0": CrossEntroLoss0,
    "MSELoss": MSEcLoss,
    "Recall": Recall,
    "Precision": Precision,
    "Recall2": Recall2,
    "Precision2": Precision2,
    "RecallLoss": RecallLoss,
    "PrecisionLoss": PrecisionLoss,
    "DistributionLoss": DistributionLoss,
    "LocalizationLoss": LocalizationLoss,
    "ClassifyLoss": ClassifyLoss,
}


def get_criterions(name_list):
    """Name list -> {name: loss callable} (multi_criterions.py:704-713)."""
    return {name: Loss_Dict[name]() for name in name_list}
