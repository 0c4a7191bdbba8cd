"""Paired (8C depth-pair) conv chains vs the folded production path.

At L0 the folded 4C lane width (64) caps the stride-1 conv at the K=N=64
MXU rate. The paired layout (ops/packed_conv.py: fold_pairs) moves 2/3 of
the conv FLOPs to one dense K=N=8C 2D conv; the two boundary depth taps
stay at 4C. This bench races the three-conv UpBlock core chain:

  A f-3d     folded (N*D, H2, W2, 4C), one NDHWC conv      (ships today)
  B paired   (N*D/2, H2, W2, 8C) in-pair + boundary convs
  C paired+b same, chain includes the fold/unfold boundary transposes

Run on the v5e chip:  python experiments/paired_chain_bench.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lintransunet_tpu import ops
from lintransunet_tpu.ops import packed_conv as pc
from experiments.folded_chain_bench import marginal, GEOMS, N_CONVS


def chain_folded(xf, kp, bp):
    c = kp.shape[-1] // 4
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1_folded(xf, kp, bp, n_volumes=1,
                                            formulation="3d")
        xf = ops.leaky_relu(pc.group_instance_norm_folded(y, c, n_volumes=1))
    return xf


def chain_paired(x8, kp, bp):
    c = kp.shape[-1] // 4
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1_paired(x8, kp, bp, n_volumes=1)
        x8 = ops.leaky_relu(pc.group_instance_norm_paired(y, c, n_volumes=1))
    return x8


def chain_paired_boundary(xf, kp, bp):
    return pc.unfold_pairs(chain_paired(pc.fold_pairs(xf, 1), kp, bp), 1)


def chain_sheared(xf, ks, bp):
    c = ks.shape[-1] // 4
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1_sheared_folded(xf, ks, bp, n_volumes=1)
        xf = ops.leaky_relu(pc.group_instance_norm_folded(y, c, n_volumes=1))
    return xf


def chain_sheared_paired(x8, ks, bp):
    c = ks.shape[-1] // 4
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1_sheared_paired(x8, ks, bp, n_volumes=1)
        x8 = ops.leaky_relu(pc.group_instance_norm_paired(y, c, n_volumes=1))
    return x8


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    for name, (h2, w2, d, c) in GEOMS.items():
        o = c
        xf = jnp.asarray(rng.standard_normal((d, h2, w2, 4 * c)),
                         jnp.bfloat16)
        kp = jnp.asarray(pc.pack_kernel_stride1(
            rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)),
            jnp.bfloat16)
        bp = jnp.asarray(np.repeat(rng.standard_normal((o,)), 4), jnp.bfloat16)
        x8 = pc.fold_pairs(xf, 1)

        # useful = ORIGINAL conv flops x N_CONVS (2*spatial*27*C*O per conv)
        useful = 2 * (h2 * 2) * (w2 * 2) * d * 27 * c * o * N_CONVS

        ks = jnp.asarray(pc.pack_kernel_stride1_sheared_jnp(jnp.asarray(
            rng.standard_normal((3, 3, 3, c, o)).astype(np.float32))),
            jnp.bfloat16)

        ta = marginal(chain_folded, xf, kp, bp)
        tb = marginal(chain_paired, x8, kp, bp)
        tc = marginal(chain_paired_boundary, xf, kp, bp)
        td = marginal(chain_sheared, xf, ks, bp)
        te = marginal(chain_sheared_paired, x8, ks, bp)
        print(f"{name}: folded-3d {ta*1e3:7.2f} ms ({useful/ta/1e12:5.1f} "
              f"useful TF/s) | paired {tb*1e3:7.2f} ({useful/tb/1e12:5.1f}) "
              f"| paired+fold {tc*1e3:7.2f} ({useful/tc/1e12:5.1f}) "
              f"| sheared {td*1e3:7.2f} ({useful/td/1e12:5.1f}) "
              f"| sheared+paired {te*1e3:7.2f} ({useful/te/1e12:5.1f})")


if __name__ == "__main__":
    main()
