"""HONEST XLA conv audit: packed vs unpacked at every hot model shape.

Round-1 conv microbenchmarks amortised with a loop-invariant body, which
XLA hoisted — the measured "3.7 TF/s at C=16 / 28 TF/s ceiling" numbers
were garbage. This audit uses marginal timing with a serialising input
perturbation (see memory/axon-tpu-measurement-rules).

For each (spatial, C->O) conv of the 512x512x64 window: time the UNPACKED
k=3 stride-1 conv at (H, W, D) and the packed equivalent at (H/2, W/2, D);
report useful TFLOP/s (original-op FLOPs) for both.

Run: python experiments/conv_xla_audit.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops import packed_conv as pc
from lintransunet_tpu.ops.conv import conv3d

# name: (H, W, D, C, O) at UNPACKED resolution
SHAPES = {
    "L0 enc conv1 (256,256,64) 16->16": (256, 256, 64, 16, 16),
    "L0 dec conv1 (256,256,64) 32->16": (256, 256, 64, 32, 16),
    "L0 dec conv2 (256,256,64) 32->16": (256, 256, 64, 32, 16),
    "L1 conv (128,128,64) 32->32": (128, 128, 64, 32, 32),
    "L1 dec conv (128,128,64) 64->32": (128, 128, 64, 64, 32),
    "L2 conv (64,64,32) 64->64": (64, 64, 32, 64, 64),
    "final (256,256,64) 16->8": (256, 256, 64, 16, 8),
}


def marginal(fn, *args, reps=6):
    def make(n):
        @jax.jit
        def looped(*a):
            def body(_, acc):
                pert = tuple(x + (0 * acc).astype(x.dtype) for x in a)
                return acc + jnp.sum(
                    fn(*pert)[0, 0, 0, 0]).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
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
    for name, (h, w, d, c, o) in SHAPES.items():
        useful = h * w * d * 27 * c * o * 2 / 1e12

        xu = jnp.asarray(rng.standard_normal((1, h, w, d, c)), jnp.bfloat16)
        ku = jnp.asarray(rng.standard_normal((3, 3, 3, c, o)) * 0.1,
                         jnp.bfloat16)
        bu = jnp.zeros((o,), jnp.bfloat16)
        t_un = marginal(
            lambda x, k, b: conv3d(x, k, b, stride=1, padding=1), xu, ku, bu)

        xp = jnp.asarray(rng.standard_normal((1, h // 2, w // 2, d, 4 * c)),
                         jnp.bfloat16)
        kp = pc.pack_kernel_stride1_jnp(ku.astype(jnp.float32)).astype(jnp.bfloat16)
        bp = pc.pack_bias_jnp(bu)
        t_pk = marginal(
            lambda x, k, b: pc.packed_conv3d_stride1(x, k, b), xp, kp, bp)

        print(f"{name:<36s} unpacked {t_un*1e3:6.2f} ms "
              f"({useful/t_un:5.1f} useful TF/s)  packed {t_pk*1e3:6.2f} ms "
              f"({useful/t_pk:5.1f})  packed speedup {t_un/t_pk:4.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
