"""Benchmark the Pallas packed stride-1 conv vs XLA on the model's shapes.

Shapes = the dominant packed convs of the 512x512x64 eval window
(encoder L0/L1, decoder L0/L1, final). Amortised marginal timing (axon
dispatch floor ~30 ms — see memory/axon-tpu-measurement-rules).

Run: python experiments/pallas_conv_bench.py [th tw]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops import packed_conv as pc
from lintransunet_tpu.ops.pallas_conv import packed_conv3d_stride1_pallas

SHAPES = {
    # name: (H2, W2, D, C, O)   (C/O = UNPACKED channels; lanes are 4C/4O)
    "enc L0 conv1 (128,128,64) 16->16": (128, 128, 64, 16, 16),
    "enc L1 conv1 (64,64,64) 32->32": (64, 64, 64, 32, 32),
    "dec L0 conv1 (128,128,64) 32->16": (128, 128, 64, 32, 16),
    "dec L0 conv2 (128,128,64) 32->16": (128, 128, 64, 32, 16),
    "dec L1 conv1 (64,64,64) 64->32": (64, 64, 64, 64, 32),
    "final (128,128,64) 16->8": (128, 128, 64, 16, 8),
}


def marginal(fn, *args, reps=8):
    def make(n):
        @jax.jit
        def looped(*a):
            def body(_, acc):
                pert = tuple(x + (0 * acc).astype(x.dtype) for x in a)
                return acc + jnp.sum(fn(*pert)[0, 0, 0, 0]).astype(jnp.float32)
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
    th, tw = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (8, 8)
    print(f"devices: {jax.devices()}  tile=({th},{tw})", file=sys.stderr)
    rng = np.random.default_rng(0)
    for name, (h2, w2, d, c, o) in SHAPES.items():
        x = jnp.asarray(rng.standard_normal((1, h2, w2, d, 4 * c)),
                        jnp.bfloat16)
        kern = jnp.asarray(rng.standard_normal((3, 3, 3, c, o)) * 0.1,
                           jnp.bfloat16)
        bias = jnp.zeros((o,), jnp.bfloat16)
        kp = pc.pack_kernel_stride1_jnp(kern)
        bp = pc.pack_bias_jnp(bias)

        t_xla = marginal(lambda x, k, b: pc.packed_conv3d_stride1(x, k, b),
                         x, kp, bp)
        t_pl = marginal(
            lambda x, k, b: packed_conv3d_stride1_pallas(x, k, b, th=th, tw=tw),
            x, kp, bp)
        raw = h2 * w2 * d * 27 * (4 * c) * (4 * o) * 2 / 1e12
        print(f"{name:<38s} xla {t_xla*1e3:6.2f} ms ({raw/t_xla:5.1f} raw TF/s)"
              f"  pallas {t_pl*1e3:6.2f} ms ({raw/t_pl:5.1f})"
              f"  speedup {t_xla/t_pl:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
