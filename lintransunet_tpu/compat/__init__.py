"""Interop helpers: reference (torch/NCHWD) <-> this framework (JAX/NHWDC)."""

from lintransunet_tpu.compat.torch_import import (
    convert_state_dict,
    from_ncdhw,
    to_ncdhw,
)

__all__ = ["convert_state_dict", "from_ncdhw", "to_ncdhw"]
