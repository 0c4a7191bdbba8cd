"""Core: typed configs and shared state containers."""

from lintransunet_tpu.core.config import (
    EvalConfig,
    InferenceConfig,
    ModelConfig,
    TrainConfig,
)

__all__ = ["ModelConfig", "TrainConfig", "EvalConfig", "InferenceConfig"]
