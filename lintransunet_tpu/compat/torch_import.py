"""Import reference PyTorch checkpoints into this framework's param pytrees.

Our module names deliberately mirror the reference's attribute paths
(ModuleList index ``i`` -> suffix ``_i``), so conversion is a mechanical
key-walk plus layout transposes:

* conv weight (O, I, kh, kw, kd)   -> kernel (kh, kw, kd, I, O)
* linear weight (O, I)             -> kernel (I, O)
* LayerNorm weight (rank-1)        -> scale
* bias                             -> bias (unchanged)

Keys with no target in the flax tree (e.g. the reference's dead
``pos_encoders_1..N`` clones that its forward never touches) are skipped
and reported.

This module needs no torch import: it accepts any mapping of key ->
array-like (e.g. ``{k: v.numpy() for k, v in state_dict.items()}``).
"""

from typing import Dict, List, Mapping, Tuple

import numpy as np


def _flax_path(torch_key: str) -> Tuple[List[str], str]:
    """'decode.block_list.0.conv1.weight' -> (['decode', 'block_list_0', 'conv1'], 'weight')."""
    parts = torch_key.split(".")
    leaf = parts[-1]
    merged: List[str] = []
    for p in parts[:-1]:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return merged, leaf


def _convert_leaf(leaf: str, value: np.ndarray):
    """(name, array) for a parameter leaf, or None for a non-parameter
    buffer (BatchNorm running stats etc.) that the caller should skip with
    a report rather than crash on — the reference's only BatchNorm is in
    the dead SolidBlock (Unet_3Dblock.py:282), but a checkpoint containing
    one must import, not raise."""
    value = np.asarray(value)
    if leaf == "weight":
        if value.ndim >= 3:  # conv: (O, I/g, k...) -> (k..., I/g, O)
            perm = tuple(range(2, value.ndim)) + (1, 0)
            return "kernel", value.transpose(perm)
        if value.ndim == 2:  # linear: (O, I) -> (I, O)
            return "kernel", value.T
        return "scale", value  # LayerNorm / norm affine
    if leaf == "bias":
        return "bias", value
    if leaf in ("running_mean", "running_var", "num_batches_tracked"):
        return None  # BatchNorm buffers: no flax target, skip-and-report
    raise ValueError(f"unhandled torch leaf {leaf!r}")


def convert_state_dict(state: Mapping[str, np.ndarray], params: Dict) -> Dict:
    """Overlay a torch state_dict onto a flax param tree (returns a new tree).

    ``params`` must be the target model's initialised ``params`` dict (used
    for structure/shape validation). Unknown torch keys are skipped;
    shape mismatches raise.
    """
    import copy

    out = copy.deepcopy(
        {k: v for k, v in params.items()}
    )
    skipped = []
    for key, value in state.items():
        path, leaf = _flax_path(key)
        converted = _convert_leaf(leaf, value)
        if converted is None:  # non-parameter buffer (BatchNorm stats)
            skipped.append(key)
            continue
        name, arr = converted
        node = out
        ok = True
        for p in path:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        if not ok or not isinstance(node, dict) or name not in node:
            skipped.append(key)
            continue
        if tuple(node[name].shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch for {key}: torch {arr.shape} vs flax "
                f"{tuple(node[name].shape)} at {'/'.join(path)}/{name}")
        node[name] = arr.astype(np.float32)
    if skipped:
        # Dead reference params (e.g. unused PEG clones) land here.
        import logging

        logging.getLogger(__name__).info(
            "convert_state_dict skipped %d torch keys: %s",
            len(skipped), skipped[:8])
    return out


def from_ncdhw(x) -> np.ndarray:
    """Reference activation layout (N, C, H, W, D) -> ours (N, H, W, D, C)."""
    return np.transpose(np.asarray(x), (0, 2, 3, 4, 1))


def to_ncdhw(x) -> np.ndarray:
    """Ours (N, H, W, D, C) -> reference (N, C, H, W, D)."""
    return np.transpose(np.asarray(x), (0, 4, 1, 2, 3))
