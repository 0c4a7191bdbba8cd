"""Shared loss math over (N, S, C) token layouts.

All losses in this package operate on channel-LAST activations
``(N, spatial..., C)`` (this framework's native layout). Internally they
flatten spatial dims to S. The reference computes the same quantities on
``(N, C, spatial...)`` after a flatten+transpose (e.g. loss/criterions.py:
23-24) — identical math, different starting layout.
"""

import jax.numpy as jnp

Array = jnp.ndarray


def flatten_tokens(x: Array) -> Array:
    """(N, spatial..., C) -> (N, S, C) in float32."""
    n = x.shape[0]
    c = x.shape[-1]
    return x.reshape(n, -1, c).astype(jnp.float32)


def flatten_labels(t: Array) -> Array:
    """(N, spatial...) or (N, spatial..., 1) -> (N, S) float32 class ids."""
    return t.reshape(t.shape[0], -1).astype(jnp.float32)


def binary_onehot(target: Array) -> Array:
    """(N, S) {0,1} -> (N, S, 2) via stack([1-t, t]).

    Matches the reference's memory-saving one-hot
    (loss/criterions.py:27, :710): backgrounds become (1, 0), foregrounds
    (0, 1) — note this is only valid for binary labels, as there.
    """
    return jnp.stack([1.0 - target, target], axis=-1)


def one_hot(target: Array, n_classes: int) -> Array:
    """F.one_hot equivalent over (N, S) integer ids -> (N, S, C)."""
    import jax

    return jax.nn.one_hot(target.astype(jnp.int32), n_classes, dtype=jnp.float32)
