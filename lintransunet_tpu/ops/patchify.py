"""Space-to-channel window embedding (2x2 in H,W; depth untouched).

Reference semantics: ``model/Unet_3Dblock.py:123-152`` — a 2x2 patchify that
quarters the token count before any conv runs. On TPU this is a pure layout
reshape/transpose that XLA fuses into the neighbouring convolution.

Layout here is channels-last ``(N, H, W, D, C)``. Channel ordering matches
the reference exactly (window element ``(i, j)`` lands at channel
``c_in * k*k + i*k + j``) so weights can be exchanged with the reference.
"""

import jax.numpy as jnp


def windows_embedding(img: jnp.ndarray, kernel_size: int = 2) -> jnp.ndarray:
    """(N, H, W, D, C) -> (N, H/k, W/k, D, C*k*k).

    Mirrors ``windows_embedding`` (Unet_3Dblock.py:123-136). The reference
    implementation absorbs the channel dim and only supports C==1; this one
    generalises to any C by keeping the per-channel blocks contiguous.
    """
    n, h, w, d, c = img.shape
    k = kernel_size
    if h % k or w % k:
        raise ValueError(f"H={h}, W={w} must be divisible by kernel_size={k}")
    x = img.reshape(n, h // k, k, w // k, k, d, c)
    # -> (N, H/k, W/k, D, C, k_h, k_w): channel-major, then window row-major.
    x = x.transpose(0, 1, 3, 5, 6, 2, 4)
    return x.reshape(n, h // k, w // k, d, c * k * k)


def windows_unembedding(img: jnp.ndarray, kernel_size: int = 2) -> jnp.ndarray:
    """(N, h, w, D, C) -> (N, h*k, w*k, D, C/(k*k)); inverse of windows_embedding.

    Mirrors ``windows_unembedding`` (Unet_3Dblock.py:138-152): channel
    ``c_out*k*k + i*k + j`` maps to spatial offset ``(i, j)`` in the window.
    """
    n, h, w, d, c = img.shape
    k = kernel_size
    if c % (k * k):
        raise ValueError(f"C={c} must be divisible by {k*k}")
    x = img.reshape(n, h, w, d, c // (k * k), k, k)
    # -> (N, h, k_h, w, k_w, D, C/k^2)
    x = x.transpose(0, 1, 5, 2, 6, 3, 4)
    return x.reshape(n, h * k, w * k, d, c // (k * k))
