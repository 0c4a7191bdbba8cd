"""Numerics debugging: structured NaN/Inf guards.

The reference debugged NaNs with inline isnan prints
(Unet_3Dblock_m.py:321-325, loss/criterions.py:722-734) and a commented-out
``torch.autograd.set_detect_anomaly`` (train3D.py:158). TPU-native
equivalents:

* global mode: ``jax.config.update("jax_debug_nans", True)`` — aborts on the
  first NaN-producing op (the detect_anomaly analogue);
* targeted guards below: jit-compatible checks via ``jax.debug`` callbacks
  or ``checkify``-style value clamps that keep the program pure.
"""

from typing import Any

import jax
import jax.numpy as jnp


def nan_guard(x: jnp.ndarray, label: str) -> jnp.ndarray:
    """Identity that prints (host callback) when the tensor has non-finite
    values. Safe under jit; costs one reduction."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x.astype(jnp.float32))))

    def _report(flag):
        if flag:
            print(f"[nan_guard] non-finite values in {label}")

    jax.debug.callback(_report, bad)
    return x


def finite_check(tree: Any) -> bool:
    """Host-side: True iff every leaf of the pytree is finite (for use at
    epoch boundaries, e.g. before checkpointing)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                return False
    return True


def enable_nan_debugging() -> None:
    """Global abort-on-NaN mode (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", True)
