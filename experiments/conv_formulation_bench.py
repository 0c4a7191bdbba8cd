"""XLA-level conv reformulations: can anything beat conv_general_dilated?

All variants compute the identical packed stride-1 conv (exactness asserted
on the first run of each):
  A. conv3d (lax.conv_general_dilated, the current op)
  B. sum of 3 depth-shifted 2D convs (depth folded into batch)
  C. sum of 27 shifted full-tensor dot_generals (tap matmuls; XLA may fuse
     the pad/slice into the dot reads)

Shape: the decoder-L0 conv1 (128,128,64 packed, 4C=128 -> 4O=64) — the
single most expensive conv of the window.

Run: python experiments/conv_formulation_bench.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops import packed_conv as pc

H2, W2, D, C4, O4 = 128, 128, 64, 128, 64


def conv_a(x, k, b):
    return pc.packed_conv3d_stride1(x, k, b)


def conv_b(x, k, b):
    """Depth taps as 3 shifted 2D convs; depth folds into the batch dim."""
    n, h2, w2, d, c4 = x.shape
    o4 = k.shape[-1]
    xb = x.transpose(0, 3, 1, 2, 4).reshape(n * d, h2, w2, c4)
    out = None
    for dp in (-1, 0, 1):
        if dp == 0:
            xs = xb
        else:
            # shift along depth: slice within each volume's depth block
            xs = x if dp else None
            pad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
            xs = pad[:, :, :, 1 + dp:1 + dp + d, :]
            xs = xs.transpose(0, 3, 1, 2, 4).reshape(n * d, h2, w2, c4)
        y = jax.lax.conv_general_dilated(
            xs, k[:, :, dp + 1], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    return (out.reshape(n, d, h2, w2, o4).transpose(0, 2, 3, 1, 4)
            + b.astype(out.dtype))


def conv_c(x, k, b):
    """27 shifted dot_generals on the padded tensor."""
    n, h2, w2, d, c4 = x.shape
    o4 = k.shape[-1]
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for dh in range(3):
        for dw in range(3):
            for dp in range(3):
                xs = pad[:, dh:dh + h2, dw:dw + w2, dp:dp + d, :]
                y = jax.lax.dot_general(
                    xs, k[dh, dw, dp],
                    dimension_numbers=(((4,), (0,)), ((), ())))
                out = y if out is None else out + y
    return out + b.astype(out.dtype)


def marginal(fn, *args, reps=6):
    def make(nn_):
        @jax.jit
        def looped(*a):
            def body(_, acc):
                pert = tuple(t + (0 * acc).astype(t.dtype) for t in a)
                return acc + jnp.sum(
                    fn(*pert)[0, 0, 0, 0]).astype(jnp.float32)
            return jax.lax.fori_loop(0, nn_, body, jnp.float32(0))
        return looped

    lo, hi = make(reps), make(3 * reps)

    def best(f):
        float(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(hi) - best(lo)) / (2 * reps)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H2, W2, D, C4)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, C4, O4)) * 0.05,
                    jnp.bfloat16)
    b = jnp.zeros((O4,), jnp.bfloat16)

    ref = jax.jit(conv_a)(x, k, b)
    for name, fn in [("B 3x conv2d", conv_b), ("C 27x dot_general", conv_c)]:
        got = jax.jit(fn)(x, k, b)
        diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
        print(f"{name}: max diff vs conv3d = {diff:.4f}", flush=True)

    raw = H2 * W2 * D * 27 * C4 * O4 * 2 / 1e12
    for name, fn in [("A conv3d", conv_a), ("B 3x conv2d", conv_b),
                     ("C 27x dot_general", conv_c)]:
        t = marginal(fn, x, k, b)
        print(f"{name:<20s} {t*1e3:6.2f} ms  ({raw/t:5.1f} raw TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
