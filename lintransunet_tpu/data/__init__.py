"""Input layer: CT datasets, transforms, K-fold split, prefetching loader."""

from lintransunet_tpu.data.datasets import (
    CachePanDataset,
    EvaPanCTDataset,
    EvaPanDataset,
    IdPosPanCTDataset,
    MultiClassEvaDataset,
    MultiClassPanCTDataset,
)
from lintransunet_tpu.data.loader import DataLoader
from lintransunet_tpu.data.split import kfold_indices, load_fold, write_split_json

__all__ = [
    "IdPosPanCTDataset",
    "EvaPanCTDataset",
    "MultiClassPanCTDataset",
    "MultiClassEvaDataset",
    "CachePanDataset",
    "EvaPanDataset",
    "DataLoader",
    "kfold_indices",
    "write_split_json",
    "load_fold",
]
