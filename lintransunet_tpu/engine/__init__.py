"""Runtime engine: jitted train/eval steps, sliding-window inference,
checkpointing, schedules, metrics."""

from lintransunet_tpu.engine.checkpoint import (
    restore_checkpoint,
    restore_params,
    save_checkpoint,
    save_params,
    save_train_state,
    restore_train_state,
)
from lintransunet_tpu.engine.metrics import MetricWriter, NullWriter
from lintransunet_tpu.engine.schedule import (
    ReduceLROnPlateau,
    get_dynamic_weight,
    get_weight,
)
from lintransunet_tpu.engine.sliding_window import (
    SlidingWindowRunner,
    sliding_window_inference,
)
from lintransunet_tpu.engine.train import (
    TrainState,
    create_train_state,
    deep_supervision_loss,
    get_learning_rate,
    make_eval_forward,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "deep_supervision_loss",
    "make_train_step",
    "make_eval_forward",
    "make_optimizer",
    "set_learning_rate",
    "get_learning_rate",
    "sliding_window_inference",
    "SlidingWindowRunner",
    "save_checkpoint",
    "restore_checkpoint",
    "save_params",
    "restore_params",
    "save_train_state",
    "restore_train_state",
    "MetricWriter",
    "NullWriter",
    "ReduceLROnPlateau",
    "get_weight",
    "get_dynamic_weight",
]
