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
    )
    return cfg.build()


def run_dirs(log_dir: str, model_dir: str, fold_num: int):
    stamp = time.strftime("%Y%m%d-%H_%M_%S")
    log = os.path.join(log_dir, stamp, f"fold_{fold_num}")
    model = os.path.join(model_dir, stamp, f"fold_{fold_num}")
    os.makedirs(log, exist_ok=True)
    os.makedirs(model, exist_ok=True)
    return log, model
