"""Jitted training engine: deep supervision, grad accumulation, AdamW+plateau.

Replaces the reference's runtime layer (utils/utils_3D_embed_full.py:21-116,
utils/utils_3D_multi_class.py:21-144) with a single compiled train step:

* deep-supervision loss over the decoder's mask pyramid with the exact
  max-pool label-pyramid schedule (utils_3D_embed_full.py:64,73-76);
* dynamic per-level weights passed as a traced array (no recompiles across
  epochs);
* gradient accumulation via optax.MultiSteps (== the reference's
  ``step_times`` micro-batching, utils_3D_embed_full.py:85-91);
* bf16 compute with f32 params replaces AMP+GradScaler (TPU needs no loss
  scaling);
* ReduceLROnPlateau lands through optax.inject_hyperparams so the LR is
  mutable state, not a compile-time constant.
"""

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from lintransunet_tpu.losses.functional import one_hot
from lintransunet_tpu.ops import max_pool3d

Array = jnp.ndarray


class TrainState(train_state.TrainState):
    """Standard flax TrainState; the full pytree is what gets checkpointed."""


def make_optimizer(learning_rate: float, step_times: int = 1,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW (torch defaults, train3D.py:193) with step_times accumulation."""
    opt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay)
    if step_times > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=step_times)
    return opt


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Write a new LR into the injected hyperparams (plateau scheduler hook)."""
    opt_state = state.opt_state
    if isinstance(opt_state, optax.MultiStepsState):
        inner = opt_state.inner_opt_state
        inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt_state = opt_state._replace(inner_opt_state=inner)
    else:
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def get_learning_rate(state: TrainState) -> float:
    opt_state = state.opt_state
    if isinstance(opt_state, optax.MultiStepsState):
        opt_state = opt_state.inner_opt_state
    return float(opt_state.hyperparams["learning_rate"])


def create_train_state(model, rng: jax.Array, sample_input: Array,
                       learning_rate: float = 1e-4,
                       step_times: int = 1) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer(learning_rate, step_times))


def label_pyramid_kernel(level: int):
    """Pool kernel applied after deep-supervision level ``level``.

    utils_3D_embed_full.py:73-76: even levels pool (2,2,2), odd (2,2,1);
    the pyramid starts from one (2,2,1) pool of the full-res labels (:64).
    """
    return (2, 2, 2) if level % 2 == 0 else (2, 2, 1)


def deep_supervision_loss(
    out: Array,
    mask_list: Sequence[Array],
    labels: Array,
    criterions: Sequence[Dict[str, Callable]],
    dynamic_weight: Array,
    criterion_weight: Optional[Sequence[float]] = None,
    num_classes: Optional[int] = None,
):
    """Total weighted deep-supervision loss + per-level per-name logs.

    ``criterions[level]`` follows the reference indexing: level L-1 is the
    full-resolution output, level L-1-k supervises mask_list[-k]
    (utils_3D_embed_full.py:66-82). ``labels``: (N, H, W, D) integer ids.
    With ``num_classes`` set, targets are one-hot per level and each
    criterion is scaled by ``criterion_weight`` (utils_3D_multi_class.py:
    84,96); otherwise raw ids are passed (binary path).
    """
    n_levels = len(criterions)
    labels_f = labels.astype(jnp.float32)[..., None]
    temp = max_pool3d(labels_f, (2, 2, 1), (2, 2, 1))

    total = jnp.float32(0.0)
    logs: Dict[str, Array] = {}
    for k in range(n_levels):
        level_criterions = criterions[n_levels - 1 - k]
        if k == 0:
            pred = out
            target_ids = labels
        else:
            pred = mask_list[-k]
            target_ids = temp[..., 0]
        if num_classes is not None:
            target = one_hot(target_ids.reshape(target_ids.shape[0], -1),
                             num_classes)
            target = target.reshape(target_ids.shape + (num_classes,))
        else:
            target = target_ids

        level_total = jnp.float32(0.0)
        weights = criterion_weight or [1.0] * len(level_criterions)
        for (name, fn), w in zip(level_criterions.items(), weights):
            value = fn(pred, target) * (w if num_classes is not None else 1.0)
            logs[f"{name} layer{n_levels - 1 - k}"] = value
            level_total = level_total + value
        total = total + level_total * dynamic_weight[k]

        if k != 0 and k < n_levels - 1:
            temp = max_pool3d(temp, label_pyramid_kernel(k), label_pyramid_kernel(k))

    return total, logs


def make_train_step(
    model,
    criterions: Sequence[Dict[str, Callable]],
    criterion_weight: Optional[Sequence[float]] = None,
    num_classes: Optional[int] = None,
    donate: bool = True,
    mesh=None,
):
    """Build the jitted train step.

    step(state, images, labels, dynamic_weight, rng) -> (state, loss, logs).
    images: (N, H, W, D, C); labels: (N, H, W, D) int; dynamic_weight: (L,).

    With ``mesh`` (a 1D data mesh) the step is jitted SPMD: the batch args
    are sharded over the data axis, params/opt state replicated, and XLA
    inserts the gradient psum over ICI — the TPU-native equivalent of the
    reference's ``nn.DataParallel`` wrap (train3D.py:119).
    """

    def loss_fn(params, images, labels, dynamic_weight, rng):
        out, mask_list = model.apply(
            {"params": params}, images, train=True, rngs={"dropout": rng})
        return deep_supervision_loss(
            out, mask_list, labels, criterions, dynamic_weight,
            criterion_weight=criterion_weight, num_classes=num_classes)

    def step(state: TrainState, images: Array, labels: Array,
             dynamic_weight: Array, rng: jax.Array):
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, labels, dynamic_weight, rng)
        state = state.apply_gradients(grads=grads)
        return state, loss, logs

    donate_argnums = (0,) if donate else ()
    if mesh is not None:
        from lintransunet_tpu import parallel

        return parallel.data_parallel_jit(step, mesh, batch_argnums=(1, 2),
                                          donate_argnums=donate_argnums)
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_forward(model, fg_only=None) -> Callable:
    """Jittable eval forward: (params, window_batch) -> probabilities.

    For MaskTransUnet this is the one-hot argmax branch, exactly what the
    reference feeds into sliding_window_inference (trans_3DUnet.py:199-202).

    ``fg_only`` (None = auto): for a 2-class MaskTransUnet, emit only the
    class-1 one-hot channel and let the sliding-window runner derive the
    background (exact — see models.registry.folded_one_hot_fg). Pair with
    ``SlidingWindowRunner(..., derive_background=forward.fg_only)``; the
    returned callable carries the resolved flag as ``forward.fg_only``.
    Auto resolves via LINTRANSUNET_EVAL_FG (default on) for 2-class
    MaskTransUnet only; other models/class counts keep full channels.
    """
    import os

    from lintransunet_tpu.models.registry import MaskTransUnet

    if fg_only is None:
        fg_only = (os.environ.get("LINTRANSUNET_EVAL_FG", "1") == "1"
                   and isinstance(model, MaskTransUnet)
                   and model.dim_output == 2)

    if fg_only:
        def forward(params, x):
            return model.apply({"params": params}, x, train=False,
                               fg_only=True)
    else:
        def forward(params, x):
            return model.apply({"params": params}, x, train=False)

    forward.fg_only = fg_only
    return forward
