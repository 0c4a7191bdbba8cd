"""Probe raw Mosaic dot throughput at the conv kernel's candidate shapes.

All kernels read one (M_PAD, K_max) bf16 tile and write (M, N) bf16.
  A. 9 x dot (M, 128)@(128, 64), f32 value accumulation   [prev probe: 12]
  B. 9 x dot (M, 128)@(128, 128)
  C. 1 x dot (M, 1152)@(1152, 64)      (tap-folded K)
  D. 1 x dot (M, 1152)@(1152, 128)
  E. 9 x dot, bf16 accumulation (acc dtype probe)
  F. 27 x dot (M, 128)@(128, 128)      (full conv tap count)

Run: python experiments/pallas_dot_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 4096
REPS = 10
GRID = 16


def bench(name, n_dots, k, n, acc_dtype=jnp.float32):
    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, n), acc_dtype)
        for t in range(n_dots):
            acc = acc + jax.lax.dot(
                x_ref[0], w_ref[t],
                preferred_element_type=acc_dtype)
        o_ref[0] = acc.astype(o_ref.dtype)

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((1, M, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_dots, k, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID, M, n), x.dtype),
        )(x, w)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((GRID, M, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((n_dots, k, n)) * 0.05,
                    jnp.bfloat16)

    @jax.jit
    def looped(x, w):
        def body(_, acc):
            return acc + jnp.sum(f(x + acc.astype(x.dtype) * 0, w)[0, 0])
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(looped(x, w))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(looped(x, w))
        times.append(time.perf_counter() - t0)
    t = min(times) / REPS
    fl = GRID * n_dots * M * k * n * 2
    print(f"{name:<44s} {t * 1e3:7.2f} ms  {fl / t / 1e12:6.1f} TFLOP/s",
          flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    bench("A. 9x (M,128)@(128,64) f32 acc", 9, 128, 64)
    bench("B. 9x (M,128)@(128,128) f32 acc", 9, 128, 128)
    bench("C. 1x (M,1152)@(1152,64)", 1, 1152, 64)
    bench("D. 1x (M,1152)@(1152,128)", 1, 1152, 128)
    bench("E. 9x (M,128)@(128,64) bf16 acc", 9, 128, 64,
          acc_dtype=jnp.bfloat16)
    bench("F. 27x (M,128)@(128,128) f32 acc", 27, 128, 128)


if __name__ == "__main__":
    main()
