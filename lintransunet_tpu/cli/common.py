"""Shared CLI plumbing: criterion schedules, model factory, run dirs."""

import os
import time
from typing import List, Tuple

from lintransunet_tpu.core.config import ModelConfig


def get_criterion_list(num_levels: int, criterion_list, loss_module
                       ) -> Tuple[List[dict], dict]:
    """Per-level criterion schedule (train3D.py:139-155).

    Low levels: CE+BalanceDice; second-to-top: CE+DiceClass; top: the
    configured list. Eval suite per train3D.py:144.
    """
    temp_list = ["CrossEntroLoss", "BalanceDiceLoss"]
    temp_list2 = ["CrossEntroLoss", "DiceClassLoss"]
    eval_list = ["BalanceDiceLoss", "DiceClassLoss", "RecallLoss",
                 "PrecisionLoss", "LocalizationLoss"]
    criterions = []
    for i in range(num_levels):
        if i < num_levels - 2:
            criterions.append(loss_module.get_criterions(temp_list))
        elif i == num_levels - 2:
            criterions.append(loss_module.get_criterions(temp_list2))
        else:
            criterions.append(loss_module.get_criterions(list(criterion_list)))
    return criterions, loss_module.get_criterions(eval_list)


def get_multi_criterion_list(num_levels: int, criterion_list, loss_module
                             ) -> Tuple[List[dict], dict]:
    """Multi-class schedule (train3D_multi_class.py:139-155): CE+Dice1+Dice2
    at every level; eval adds DiceClassLoss0/2."""
    level_list = ["CrossEntroLoss", "DiceClassLoss", "DiceClassLoss2"]
    eval_list = ["DiceClassLoss0", "DiceClassLoss", "DiceClassLoss2",
                 "RecallLoss", "PrecisionLoss"]
    criterions = [loss_module.get_criterions(
        list(criterion_list) if i == num_levels - 1 else level_list)
        for i in range(num_levels)]
    return criterions, loss_module.get_criterions(eval_list)


def make_eval_runner(model, cfg, sw_batch_size=1):
    """(eval_forward, SlidingWindowRunner) from an EvalConfig.

    The one place the eval sliding-window geometry
    (utils_3D_embed_full.py:135-148: square roi, overlap 0.6, constant
    blending / sigma_scale=0) turns into a runner; every CLI builds its
    ``EvalConfig`` from its flags and calls this.
    """
    from lintransunet_tpu import engine

    eval_fwd = engine.make_eval_forward(model)
    runner = engine.SlidingWindowRunner(
        lambda x, params: eval_fwd(params, x),
        roi_size=(cfg.roi_size, cfg.roi_size, cfg.depth_size),
        sw_batch_size=sw_batch_size, overlap=cfg.overlap, mode=cfg.mode,
        depth_bucket=min(32, cfg.depth_size),
        derive_background=eval_fwd.fg_only)
    return eval_fwd, runner


def build_model(args) -> "ModelConfig":
    cfg = ModelConfig(
        model_name=args.model_name,
        num_layers=tuple(args.num_layers),
        roi_size_list=tuple(args.roi_size_list),
        is_roi_list=tuple(args.is_roi_list),
        dim_input=args.dim_input,
        dim_output=args.dim_output,
        kernel_size=args.kernel_size,
        compute_dtype=getattr(args, "compute_dtype", "bfloat16"),
        attn_layers=getattr(args, "attn_layers", 8),
    )
    return cfg.build()


def batched_predictions(loader, runner, params, mesh=None):
    """Yield (index, images, masks, predict) per eval volume.

    With ``mesh`` (a 1D data mesh), volumes are grouped mesh-size at a time
    and run through ONE batch-sharded sliding-window program — each chip
    blends its own volume (BASELINE config 5). Without a mesh this is the
    plain per-volume path; outputs are identical either way.
    """
    import jax.numpy as jnp

    if mesh is None:
        for i, (images, masks) in enumerate(loader):
            images = images.reshape((-1,) + images.shape[2:])
            masks = masks.reshape((-1,) + masks.shape[2:])
            yield i, images, masks, runner(jnp.asarray(images), params)
        return

    group = int(mesh.devices.size)
    buf = []

    def flush():
        vols = [jnp.asarray(im) for (_, im, _) in buf]
        pad = (-len(vols)) % group
        vols = vols + [vols[0]] * pad  # pad group; extras discarded
        preds = runner.run_batch(vols, params, mesh=mesh)
        return [(i, im, mk, preds[j]) for j, (i, im, mk) in enumerate(buf)]

    for i, (images, masks) in enumerate(loader):
        images = images.reshape((-1,) + images.shape[2:])
        masks = masks.reshape((-1,) + masks.shape[2:])
        buf.append((i, images, masks))
        if len(buf) == group:
            yield from flush()
            buf.clear()
    if buf:
        yield from flush()


def run_dirs(log_dir: str, model_dir: str, fold_num: int):
    stamp = time.strftime("%Y%m%d-%H_%M_%S")
    log = os.path.join(log_dir, stamp, f"fold_{fold_num}")
    model = os.path.join(model_dir, stamp, f"fold_{fold_num}")
    os.makedirs(log, exist_ok=True)
    os.makedirs(model, exist_ok=True)
    return log, model
