"""Loss zoo: binary (loss/criterions.py) and multi-class (loss/multi_criterions.py).

``binary.get_criterions`` / ``multiclass.get_criterions`` mirror the
reference's factories; registry names are identical.
"""

from lintransunet_tpu.losses import binary, multiclass
from lintransunet_tpu.losses.binary import get_criterions

__all__ = ["binary", "multiclass", "get_criterions"]
