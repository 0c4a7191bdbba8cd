"""Probe: do sublane-ALIGNED row-offset slices feed the MXU copy-free?

The round-1 Pallas conv prototype was stuck at ~28 TFLOP/s-equivalent
because Mosaic materialised every tap's strided slice as a VMEM copy. The
planned conv kernel flattens the padded tile to (M_pad, K) rows so each
(dh, dw) tap becomes a CONTIGUOUS row-offset slice; if the offset is a
multiple of the sublane tile (8 rows), the dot should read it in place.

Kernels (all same FLOPs: 9 dots of (M, K) @ (K, N)):
  A. 9 dots at row offset 0 (upper bound: zero slicing)
  B. 9 dots at aligned row offsets (k * 576)
  C. 9 dots at MISALIGNED row offsets (k * 577)

Run: python experiments/pallas_rowoffset_probe.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 8 * 18 * 64          # output rows per tile (TH*(TW+2)*D)
HALO = 2 * 18 * 64       # extra rows (two H halo rows)
M_PAD = M + HALO         # flattened padded tile rows
K, N = 128, 64
REPS = 10
GRID = 32                # tiles per kernel launch


def make_kernel(offsets):
    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.float32)
        for t, off in enumerate(offsets):
            a = x_ref[0, pl.ds(off, M), :]
            acc = acc + jax.lax.dot(
                a, w_ref[t], preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)
    return kernel


def build(offsets):
    kernel = make_kernel(offsets)

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((1, M_PAD, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, K, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID, M, N), x.dtype),
        )(x, w)
    return f


def bench(name, offsets, x, w):
    f = build(offsets)

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
    fl = GRID * 9 * M * K * N * 2
    print(f"{name:<44s} {t * 1e3:7.2f} ms  {fl / t / 1e12:6.1f} TFLOP/s",
          flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((GRID, M_PAD, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((9, K, N)) * 0.05, jnp.bfloat16)

    bench("A. 9 dots, zero offsets", [0] * 9, x, w)
    bench("B. 9 dots, ALIGNED offsets (k*576)",
          [k * 576 for k in range(3)] * 3, x, w)
    bench("C. 9 dots, MISALIGNED offsets (k*577)",
          [min(k * 577, HALO) for k in range(3)] * 3, x, w)


if __name__ == "__main__":
    main()
