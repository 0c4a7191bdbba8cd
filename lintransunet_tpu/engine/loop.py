"""Epoch-level train/eval loops (runtime layer).

Mirrors the reference's runtime layer semantics:

* ``train_on_epoch`` (utils/utils_3D_embed_full.py:21-116 /
  utils_3D_multi_class.py:21-144): flatten the (patient, samples) batch,
  run ``patient_epochs`` micro-steps with random frame resampling, gradient
  accumulation inside the jitted step, per-loss TensorBoard scalars.
* ``eval_on_epoch`` (utils_3D_embed_full.py:118-169 /
  utils_3D_multi_class.py:146-208): sliding-window inference per volume,
  threshold/binarise, criterion suite, model-selection metric
  (DiceClassLoss, + DiceClassLoss2 for multi-class).

Host work here is orchestration only; all math is inside the jitted step /
sliding-window program.
"""

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.losses.functional import one_hot


def train_on_epoch(
    state,
    loader,
    step_fn: Callable,
    dynamic_weight: Sequence[float],
    patient_epochs: int,
    patient_batchsize: int,
    writer,
    global_step: int,
    rng: np.random.Generator,
    jax_rng: jax.Array,
    place: Optional[Callable] = None,
):
    """One epoch; returns (state, mean patient loss, new global_step).

    ``place`` maps a host batch onto device(s) — ``jnp.asarray`` by default,
    or ``parallel.shard_batch`` under a data-parallel mesh."""
    place = place or jnp.asarray
    dyn_w = jnp.asarray(dynamic_weight, jnp.float32)
    batch_level_loss = 0.0
    n_batches = 0

    for i, (images, masks) in enumerate(loader):
        # (B, num_samples, H, W, D, 1) -> (frames, H, W, D, 1)
        images = images.reshape((-1,) + images.shape[2:])
        masks = masks.reshape((-1,) + masks.shape[2:])
        frames = images.shape[0]

        # Device scalars are collected and fetched in ONE device_get per
        # patient: a float() per logged loss per micro-step would cost a
        # host round trip each (~25 ms on the tunnel) and serialise the
        # pipeline, dwarfing the step itself.
        pending = []
        for j in range(patient_epochs):
            idx = rng.integers(0, frames, size=patient_batchsize)
            batch_images = place(images[idx])
            batch_masks = place(masks[idx].astype(np.int32))
            jax_rng, sub = jax.random.split(jax_rng)
            state, loss, logs = step_fn(state, batch_images, batch_masks,
                                        dyn_w, sub)
            pending.append((loss, logs))

        fetched = jax.device_get(pending)
        patient_loss = float(sum(l for l, _ in fetched))
        log_accum: Dict[str, float] = {}
        for _, logs in fetched:
            for k, v in logs.items():
                log_accum[k] = log_accum.get(k, 0.0) + float(v)

        patient_loss /= patient_epochs
        writer.add_scalar("train/total_loss", patient_loss, global_step + i)
        for k, v in log_accum.items():
            writer.add_scalar(f"train/{k}", v / patient_epochs, global_step + i)
        batch_level_loss += patient_loss
        n_batches += 1

    global_step += max(n_batches - 1, 0)
    return state, batch_level_loss / max(n_batches, 1), global_step


def eval_on_epoch(
    runner,
    loader,
    criterions: Dict[str, Callable],
    writer,
    global_step: int,
    threshold: float = 0.5,
    num_classes: Optional[int] = None,
    selection_metrics: Sequence[str] = ("DiceClassLoss",),
    runner_args: tuple = (),
):
    """Sliding-window eval; returns (selection metric value, global_step+1).

    ``runner`` is a SlidingWindowRunner over the eval forward. For the
    binary path predictions are thresholded at 0.5
    (utils_3D_embed_full.py:153); multi-class losses get one-hot labels
    (utils_3D_multi_class.py:174-180).
    """
    totals = {name: 0.0 for name in criterions}
    n = 0
    for images, masks in loader:
        images = images.reshape((-1,) + images.shape[2:])
        masks = masks.reshape((-1,) + masks.shape[2:])
        predict = runner(jnp.asarray(images), *runner_args)
        if num_classes is None:
            # binary path binarises at 0.5 (utils_3D_embed_full.py:153);
            # the multi-class eval defines a threshold but never applies it
            # (utils_3D_multi_class.py:168) — criterions see raw blends
            predict = (predict >= threshold).astype(jnp.float32)
        if num_classes is not None:
            target = one_hot(
                jnp.asarray(masks.astype(np.int32)).reshape(masks.shape[0], -1),
                num_classes).reshape(masks.shape + (num_classes,))
        else:
            target = jnp.asarray(masks.astype(np.int32))
        values = jax.device_get({name: fn(predict, target)
                                 for name, fn in criterions.items()})
        for name, v in values.items():
            totals[name] += float(v)
        n += 1

    out_loss = 0.0
    total = sum(totals.values()) / max(n, 1)
    writer.add_scalar("eval/total_loss", total, global_step)
    for name, value in totals.items():
        mean = value / max(n, 1)
        if name in selection_metrics:
            out_loss += mean
        writer.add_scalar(f"eval/{name}", mean, global_step)
    return out_loss, global_step + 1
