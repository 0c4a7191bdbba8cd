"""TPU micro-bench: dense packed conv vs sheared packed conv (s1, k=3).

Level-0/1 geometries of the 512x512x64 eval window. Amortised fori_loop
timing with a scalar transfer barrier (axon rules).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops import packed_conv as pc

REPS = 20


def bench(fn, x, k, b):
    f = jax.jit(lambda x, k, b: jax.lax.fori_loop(
        0, REPS, lambda i, acc: acc + jnp.sum(fn(x, k, b)[0, 0, 0, 0]),
        jnp.float32(0.0)))
    float(f(x, k, b))  # compile
    t0 = time.perf_counter()
    float(f(x, k, b))
    return (time.perf_counter() - t0) / REPS


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    for name, (h2, w2, d, c, o) in {
        "L0 128x128x64 C16->16": (128, 128, 64, 16, 16),
        "L1 64x64x64 C32->32": (64, 64, 64, 32, 32),
        "L1 concat 64x64x64 C64->32": (64, 64, 64, 64, 32),
        "L2 32x32x32 C64->64": (32, 32, 32, 64, 64),
    }.items():
        x = jnp.asarray(rng.standard_normal((1, h2, w2, d, 4 * c)),
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, c, o)), jnp.bfloat16)
        b = jnp.zeros((o,), jnp.bfloat16)
        t_dense = bench(
            lambda x, k, b: pc.packed_conv3d_stride1(
                x, pc.pack_kernel_stride1_jnp(k), pc.pack_bias_jnp(b)),
            x, k, b)
        t_sheared = bench(
            lambda x, k, b: pc.packed_conv3d_stride1_sheared(
                x, pc.pack_kernel_stride1_sheared_jnp(k), pc.pack_bias_jnp(b)),
            x, k, b)
        gf = h2 * w2 * d * 4 * 27 * c * o * 2 / 1e9  # original-FLOPs
        print(f"{name}: dense {t_dense*1e3:.2f} ms  sheared {t_sheared*1e3:.2f} ms  "
              f"speedup {t_dense/t_sheared:.2f}x  "
              f"equiv {gf/t_sheared/1e3:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
