"""dspatial conv formulation probe: batch=H, spatial=(D, W).

Motivation (round-4 trace, 2026-08-20): XLA lays the folded/paired buffers
out as {3,0,2,1} — lanes minor, the ROW (depth) dim second-minor (sublane),
H major-most. Depth-tap row shifts are therefore SUBLANE shifts, which XLA
must materialise: the paired "pads" boundary operands show up as seven
~0.8 ms dual-output kLoop slice fusions (~5.7 ms/window), and the folded
"taps" formulation materialises a row-padded buffer per conv.

If instead the conv runs with batch=H2 and spatial=(ROWS, W2) — legal via
explicit ConvDimensionNumbers, no transpose in JAX — the depth taps move
INSIDE the conv (zero slices, conv zero-padding at the depth ends is
exactly the semantics for n_volumes=1), and the 3 kh taps become convs on
H-slices, which are free views (H is major-most). Same MACs.

This probe answers, on-chip:
  1. lowering sanity: is a dspatial 9-tap conv anywhere near the NHWC
     9-tap conv's rate, or does XLA transpose internally?
  2. chain race at the shipping L0/L1 geometries vs the production
     formulations (bit-identity asserted).

Run: python experiments/dspatial_probe.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lintransunet_tpu import ops
from lintransunet_tpu.ops import packed_conv as pc
from experiments.folded_chain_bench import marginal

# dimension_numbers: lhs (ND, H2, W2, C) with batch=H2(1), feature=C(3),
# spatial=(ND(0), W2(2)); rhs (kd, kw, C, O): out_f=3, in_f=2,
# spatial=(0, 1); out mirrors lhs.
DN_DS = jax.lax.ConvDimensionNumbers(
    lhs_spec=(1, 3, 0, 2), rhs_spec=(3, 2, 0, 1), out_spec=(1, 3, 0, 2))


def conv_ds(x, k, pad_d=(1, 1), rhs_dilation=None):
    """x: (ND, H2, W2, C); k: (kd, kw, C, O) -> (ND', H2, W2', O)."""
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [pad_d, (1, 1)], rhs_dilation=rhs_dilation,
        dimension_numbers=DN_DS)


def folded_s1_dspatial(xf, packed_kernel, bias=None):
    """packed_conv3d_stride1_folded, dspatial formulation (n_volumes=1).

    packed_kernel: (kh=3, kw=3, kd=3, 4C, 4O). Depth taps ride the conv's
    first spatial dim (rows); kh taps are three convs on free H-slices with
    outputs padded back (the pads fuse into the adds).
    """
    kp = packed_kernel.astype(xf.dtype)
    # per-kh kernel: (kw, kd, C, O) -> (kd, kw, C, O)
    k = [kp[kh].transpose(1, 0, 2, 3) for kh in range(3)]
    h2 = xf.shape[1]
    out = conv_ds(xf, k[1])
    top = conv_ds(xf[:, :h2 - 1], k[0])
    bot = conv_ds(xf[:, 1:], k[2])
    out = out + jnp.pad(top, ((0, 0), (1, 0), (0, 0), (0, 0)))
    out = out + jnp.pad(bot, ((0, 0), (0, 1), (0, 0), (0, 0)))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def paired_s1_dspatial(x8, packed_kernel, bias=None):
    """packed_conv3d_stride1_paired, dspatial boundary formulation.

    Main in-pair conv unchanged (dense K=8C 2D NHWC, batch=rows). The two
    cross-pair boundary taps become ONE dspatial conv per kh tap: kernel
    size 2 over rows with rhs_dilation=2 (taps at row -1/+1), zero-blocked
    lanes (g1->g0 at kd=0 / g0->g1 at kd=2). Zero slice materialisation.
    """
    kp = packed_kernel.astype(x8.dtype)
    c4, o4 = kp.shape[-2:]
    z = jnp.zeros_like(kp[:, :, 0])
    # boundary block kernel per row tap: row -1: [[0, kd0],[0, 0]] mapping
    # g_in=1 -> g_out=0; row +1: [[0, 0],[kd2, 0]] mapping g_in=0 -> g_out=1
    up8 = jnp.concatenate([jnp.concatenate([z, z], -1),
                           jnp.concatenate([kp[:, :, 0], z], -1)], -2)
    dn8 = jnp.concatenate([jnp.concatenate([z, kp[:, :, 2]], -1),
                           jnp.concatenate([z, z], -1)], -2)
    kb = jnp.stack([up8, dn8], axis=0)  # (2, kh, kw, 8C, 8O)
    y = jax.lax.conv_general_dilated(
        x8, pc.pair_kernel_stride1_jnp(kp), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h2 = x8.shape[1]
    for kh in range(3):
        kbh = kb[:, kh]  # (2 row taps, kw, 8C, 8O)
        xs = x8 if kh == 1 else (x8[:, :h2 - 1] if kh == 0 else x8[:, 1:])
        b = conv_ds(xs, kbh, pad_d=(1, 1), rhs_dilation=(2, 1))
        if kh == 0:
            b = jnp.pad(b, ((0, 0), (1, 0), (0, 0), (0, 0)))
        elif kh == 2:
            b = jnp.pad(b, ((0, 0), (0, 1), (0, 0), (0, 0)))
        y = y + b
    if bias is not None:
        b4 = bias.astype(y.dtype)
        y = y + jnp.concatenate([b4, b4], axis=-1)
    return y


N_CONVS = 3


def chain(conv_fn, x, kp, bp, norm_fn, c):
    for _ in range(N_CONVS):
        y = conv_fn(x, kp, bp)
        x = ops.leaky_relu(norm_fn(y, c, n_volumes=1))
    return x


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    for name, (h2, w2, d, c) in {
        "L0 128x128x64 C16": (128, 128, 64, 16),
        "L1 64x64x64 C32": (64, 64, 64, 32),
    }.items():
        c4 = 4 * c
        kern = rng.standard_normal((3, 3, 3, c4, c4)).astype(np.float32) * .05
        bias = rng.standard_normal((c4,)).astype(np.float32) * .01
        kp = jnp.asarray(kern, jnp.bfloat16)
        bp = jnp.asarray(bias, jnp.bfloat16)
        xf = jnp.asarray(rng.standard_normal((d, h2, w2, c4)), jnp.bfloat16)

        # bit-identity: dspatial folded == shipping taps
        ref = pc.packed_conv3d_stride1_folded(xf, kp, bp, n_volumes=1,
                                              formulation="taps")
        got = folded_s1_dspatial(xf, kp, bp)
        # tap regrouping (kd-major -> kh-major) reorders the partial sums,
        # so equality is within-ulp, not bitwise
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(got, np.float32),
                                   rtol=1e-1, atol=1e-1)
        t_ship = marginal(
            lambda x, k, b: chain(
                lambda a, kk, bb: pc.packed_conv3d_stride1_folded(
                    a, kk, bb, n_volumes=1),
                x, k, b, pc.group_instance_norm_folded, c), xf, kp, bp)
        t_ds = marginal(
            lambda x, k, b: chain(folded_s1_dspatial, x, k, b,
                                  pc.group_instance_norm_folded, c),
            xf, kp, bp)
        print(f"{name} folded: ship {t_ship*1e3:.2f} ms  "
              f"dspatial {t_ds*1e3:.2f} ms")

        # paired
        x8 = pc.fold_pairs(xf, 1)
        ref = pc.packed_conv3d_stride1_paired(x8, kp, bp, n_volumes=1,
                                              formulation="pads")
        got = paired_s1_dspatial(x8, kp, bp)
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(got, np.float32),
                                   rtol=1e-1, atol=1e-1)
        t_ship = marginal(
            lambda x, k, b: chain(
                lambda a, kk, bb: pc.packed_conv3d_stride1_paired(
                    a, kk, bb, n_volumes=1, formulation="pads"),
                x, k, b, pc.group_instance_norm_paired, c), x8, kp, bp)
        t_ds = marginal(
            lambda x, k, b: chain(paired_s1_dspatial, x, k, b,
                                  pc.group_instance_norm_paired, c),
            x8, kp, bp)
        print(f"{name} paired: ship {t_ship*1e3:.2f} ms  "
              f"dspatial {t_ds*1e3:.2f} ms")


if __name__ == "__main__":
    main()
