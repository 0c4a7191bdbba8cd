"""Folded-layout decoder chains vs the per-call-dfold production path.

The round-3 xplane trace (docs/DESIGN.md §10) shows ~29 ms/window of pure
layout copies, dominated by the per-call depth fold/unfold transposes
inside packed_conv3d_stride1. This bench races a representative decoder
conv chain (conv+IN+relu x3, the UpBlock core chained as levels chain) on
the real L0/L1 eval-window shapes across regimes:

  A prod     packed 5D layout, per-call dfold          (ships today)
  B f-taps   folded (N*D, H2, W2, 4C), 3 depth-tap 2D convs (pad+slices)
  C f-3d     folded, ONE conv_general_dilated with depth leading (NDHWC)

Run on the v5e chip:  python experiments/folded_chain_bench.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu import ops
from lintransunet_tpu.ops import packed_conv as pc


def marginal(fn, *args, reps=6):
    def make(nn_):
        @jax.jit
        def looped(*a):
            def body(_, acc):
                pert = tuple(t + (0 * acc).astype(t.dtype) for t in a)
                return acc + jnp.sum(fn(*pert)[0, 0, 0, 0]).astype(jnp.float32)
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


GEOMS = {
    # (H2, W2, D, C): packed grid dims + ORIGINAL channels, eval window
    "L0 128x128x64 C16": (128, 128, 64, 16),
    "L1 64x64x64 C32": (64, 64, 64, 32),
}

N_CONVS = 3


def chain_prod(xp, kp, bp):
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1(xp, kp, bp)
        c = kp.shape[-1] // 4
        xp = ops.leaky_relu(pc.group_instance_norm_packed(y, c))
    return xp


def chain_folded(xf, kp, bp, formulation):
    c = kp.shape[-1] // 4
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1_folded(xf, kp, bp, n_volumes=1,
                                            formulation=formulation)
        xf = ops.leaky_relu(pc.group_instance_norm_folded(y, c, n_volumes=1))
    return xf


def chain_sheared(xf, ks, bp):
    c = ks.shape[-1] // 4
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1_sheared_folded(xf, ks, bp, n_volumes=1)
        xf = ops.leaky_relu(pc.group_instance_norm_folded(y, c, n_volumes=1))
    return xf


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    for name, (h2, w2, d, c) in GEOMS.items():
        x = jnp.asarray(rng.standard_normal((1, h2, w2, d, 4 * c)),
                        jnp.bfloat16)
        k = rng.standard_normal((3, 3, 3, c, c)).astype(np.float32) * 0.05
        kp = jnp.asarray(pc.pack_kernel_stride1(k), jnp.bfloat16)
        ks = jnp.asarray(pc.pack_kernel_stride1_sheared_jnp(
            jnp.asarray(k)), jnp.bfloat16)
        bp = jnp.zeros((4 * c,), jnp.bfloat16)
        xf = pc.fold_depth(x)
        orig_g = h2 * w2 * d * 4 * 27 * c * c * 2 * N_CONVS / 1e12

        ref = jax.jit(chain_prod)(x, kp, bp).astype(jnp.float32)
        variants = [
            ("A prod per-call dfold", lambda: marginal(chain_prod, x, kp, bp),
             lambda: jax.jit(chain_prod)(x, kp, bp).astype(jnp.float32)),
            ("B folded taps", lambda: marginal(
                lambda xf_, kp_, bp_: chain_folded(xf_, kp_, bp_, "taps"),
                xf, kp, bp),
             lambda: pc.unfold_depth(jax.jit(
                 lambda xf_: chain_folded(xf_, kp, bp, "taps"))(xf),
                 1).astype(jnp.float32)),
            ("C folded 3d-conv", lambda: marginal(
                lambda xf_, kp_, bp_: chain_folded(xf_, kp_, bp_, "3d"),
                xf, kp, bp),
             lambda: pc.unfold_depth(jax.jit(
                 lambda xf_: chain_folded(xf_, kp, bp, "3d"))(xf),
                 1).astype(jnp.float32)),
            ("D folded sheared", lambda: marginal(
                chain_sheared, xf, ks, bp),
             lambda: pc.unfold_depth(jax.jit(
                 lambda xf_: chain_sheared(xf_, ks, bp))(xf),
                 1).astype(jnp.float32)),
        ]
        print(f"\n== {name}  ({N_CONVS}-conv chain, orig "
              f"{orig_g * 1e3:.0f} GFLOP) ==", flush=True)
        for label, timer, check in variants:
            diff = float(jnp.max(jnp.abs(check() - ref)))
            assert diff < 0.25, f"{label} mismatch {diff}"
            t = timer()
            print(f"{label:<22s} {t * 1e3:7.2f} ms   "
                  f"useful {orig_g / t:5.1f} TF/s   maxdiff {diff:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
