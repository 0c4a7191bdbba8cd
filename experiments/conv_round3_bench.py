"""Round-3 conv formulations: sheared packing, subpos-major realign, 8C.

The decoder conv spine (~45 ms of the 92 ms eval window) runs dense 2x2
packed k=3 convs at 4x the original FLOPs. The sheared kernel transform
(ops/packed_conv.py:pack_kernel_stride1_sheared_jnp) cuts that to 16/9x but
was never validly measured (the old sheared_conv_bench.py predates the
marginal-timing discipline — its fori_loop body could be hoisted). This
bench measures, with amortised marginal timing (axon rules):

  A. dense depth-folded packed conv (current production op)
  B. sheared, channel-major realign (existing code: strided ::4 channel
     slices — suspected layout-hostile)
  C. sheared, SUBPOS-MAJOR kernel + realign (4 contiguous channel-block
     slices + concat; output converted back to channel-major by one lane
     permute, also measured without the conversion)
  D. 8C = 2x2x2 (depth-pair) sheared subpos-major, 64/27x FLOPs, K=N
     full-lane at L0 (in 8C=128) — output on the (H2, W2, D2) grid.

All variants are exactness-asserted against the dense reference first.

Run: python experiments/conv_round3_bench.py [--level L0|L1|all]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops import packed_conv as pc
from lintransunet_tpu.ops.conv import conv3d


# ---------------------------------------------------------------- transforms
def pack_kernel_sheared_subpos(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, kd, C, O) -> sheared packed kernel (2, 2, kd, 4C, 4O) with
    SUBPOS-MAJOR output channels: co = (alpha*2 + beta)*O + o. Input stays
    channel-major (ci = c*4 + a*2 + b) to match the activations."""
    kh, kw, kd, c, o = kernel.shape
    out = jnp.zeros((2, 2, kd, 4 * c, 4 * o), kernel.dtype)
    ci_base = jnp.arange(c) * 4
    co_base = jnp.arange(o)
    for bi in (0, 1):
        for bj in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    for alpha in (0, 1):
                        for beta in (0, 1):
                            dh = 2 * bi + a - 2 + alpha
                            dw = 2 * bj + b - 2 + beta
                            if -1 <= dh <= 1 and -1 <= dw <= 1:
                                ci = ci_base + a * 2 + b
                                co = co_base + (alpha * 2 + beta) * o
                                out = out.at[bi, bj, :,
                                             ci[:, None], co[None, :]].set(
                                    kernel[dh + 1, dw + 1].transpose(1, 2, 0))
    return out


def sheared_subpos_conv(x_packed, k_subpos, bias=None, kd_pad=1,
                        to_channel_major=True):
    """Sheared packed s1 conv with subpos-major realign.

    Realign = 4 contiguous channel-block slices at distinct spatial offsets
    + channel concat (no ::4 strided channel slices)."""
    n, h2, w2, d, c4 = x_packed.shape
    o4 = k_subpos.shape[-1]
    o = o4 // 4
    y = jnp.pad(x_packed, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    y = conv3d(y, k_subpos, bias=None, stride=1, padding=(0, 0, kd_pad))
    parts = [y[:, alpha:alpha + h2, beta:beta + w2, :,
               (alpha * 2 + beta) * o:(alpha * 2 + beta + 1) * o]
             for alpha in (0, 1) for beta in (0, 1)]
    out = jnp.concatenate(parts, axis=-1)  # subpos-major (…, 4O)
    if to_channel_major:
        out = out.reshape(n, h2, w2, d, 4, o).swapaxes(-1, -2)
        out = out.reshape(n, h2, w2, d, o4)
    if bias is not None:
        rep = (jnp.tile(bias[None, :], (4, 1)).reshape(-1)
               if not to_channel_major else jnp.repeat(bias, 4))
        out = out + rep.astype(out.dtype)
    return out


def sheared_subpos_conv_dfold(x_packed, k_subpos, bias=None,
                              to_channel_major=True):
    """Variant of sheared_subpos_conv with depth taps folded into batch
    (the trick that made the dense conv 1.6x: 3 depth-shifted 2D convs)."""
    n, h2, w2, d, c4 = x_packed.shape
    o4 = k_subpos.shape[-1]
    o = o4 // 4
    k_subpos = k_subpos.astype(x_packed.dtype)
    pad = jnp.pad(x_packed, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for dp in range(3):
        xs = pad[:, :, :, dp:dp + d, :]
        xb = xs.transpose(0, 3, 1, 2, 4).reshape(n * d, h2 + 2, w2 + 2, c4)
        y = jax.lax.conv_general_dilated(
            xb, k_subpos[:, :, dp], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    y = out.reshape(n, d, h2 + 1, w2 + 1, o4).transpose(0, 2, 3, 1, 4)
    parts = [y[:, alpha:alpha + h2, beta:beta + w2, :,
               (alpha * 2 + beta) * o:(alpha * 2 + beta + 1) * o]
             for alpha in (0, 1) for beta in (0, 1)]
    out = jnp.concatenate(parts, axis=-1)
    if to_channel_major:
        out = out.reshape(n, h2, w2, d, 4, o).swapaxes(-1, -2)
        out = out.reshape(n, h2, w2, d, o4)
    if bias is not None:
        rep = (jnp.tile(bias[None, :], (4, 1)).reshape(-1)
               if not to_channel_major else jnp.repeat(bias, 4))
        out = out + rep.astype(out.dtype)
    return out


# ------------------------------------------------------------------ 8C (2^3)
def pack8(x):
    """channel-major 2x2-packed (N, H2, W2, D, 4C) -> depth-pair packed
    (N, H2, W2, D/2, 8C), ci8 = c*8 + a*4 + b*2 + g."""
    n, h2, w2, d, c4 = x.shape
    t = x.reshape(n, h2, w2, d // 2, 2, c4)
    t = jnp.moveaxis(t, 4, 5)  # (…, c4, g)
    return t.reshape(n, h2, w2, d // 2, 2 * c4)


def unpack8(x8):
    n, h2, w2, d2, c8 = x8.shape
    t = x8.reshape(n, h2, w2, d2, c8 // 2, 2)
    t = jnp.moveaxis(t, 5, 4)
    return t.reshape(n, h2, w2, d2 * 2, c8 // 2)


def pack_kernel_sheared8_subpos(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, C, O) -> 3-axis sheared kernel (2, 2, 2, 8C, 8O), output
    subpos-major: co = ((alpha*2 + beta)*2 + gamma)*O + o."""
    kh, kw, kd, c, o = kernel.shape
    out = jnp.zeros((2, 2, 2, 8 * c, 8 * o), kernel.dtype)
    ci_base = jnp.arange(c) * 8
    co_base = jnp.arange(o)
    for bi in (0, 1):
        for bj in (0, 1):
            for bk in (0, 1):
                for a in (0, 1):
                    for b in (0, 1):
                        for g in (0, 1):
                            for alpha in (0, 1):
                                for beta in (0, 1):
                                    for gamma in (0, 1):
                                        dh = 2 * bi + a - 2 + alpha
                                        dw = 2 * bj + b - 2 + beta
                                        dd = 2 * bk + g - 2 + gamma
                                        if not (-1 <= dh <= 1 and
                                                -1 <= dw <= 1 and
                                                -1 <= dd <= 1):
                                            continue
                                        ci = ci_base + a * 4 + b * 2 + g
                                        co = co_base + (
                                            (alpha * 2 + beta) * 2
                                            + gamma) * o
                                        out = out.at[
                                            bi, bj, bk,
                                            ci[:, None], co[None, :]].set(
                                            kernel[dh + 1, dw + 1, dd + 1])
    return out


def sheared8_subpos_conv(x8, k8, bias=None, dfold=True):
    """3-axis sheared 8C conv; output stays subpos-major 8C on the
    (H2, W2, D2) grid. dfold folds the 2 depth taps into batch."""
    n, h2, w2, d2, c8 = x8.shape
    o8 = k8.shape[-1]
    o = o8 // 8
    k8 = k8.astype(x8.dtype)
    if dfold:
        pad = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        out = None
        for dp in range(2):
            xs = pad[:, :, :, dp:dp + d2 + 1, :]
            xb = xs.transpose(0, 3, 1, 2, 4).reshape(
                n * (d2 + 1), h2 + 2, w2 + 2, c8)
            y = jax.lax.conv_general_dilated(
                xb, k8[:, :, dp], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
        y = out.reshape(n, d2 + 1, h2 + 1, w2 + 1, o8).transpose(
            0, 2, 3, 1, 4)
    else:
        pad = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            pad, k8, (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    parts = [y[:, alpha:alpha + h2, beta:beta + w2, gamma:gamma + d2,
               ((alpha * 2 + beta) * 2 + gamma) * o:
               ((alpha * 2 + beta) * 2 + gamma + 1) * o]
             for alpha in (0, 1) for beta in (0, 1) for gamma in (0, 1)]
    out = jnp.concatenate(parts, axis=-1)  # subpos-major 8C
    if bias is not None:
        out = out + jnp.tile(bias[None, :], (8, 1)).reshape(-1).astype(
            out.dtype)
    return out


def subpos8_to_channel_major4(x8s):
    """subpos-major 8C output -> channel-major 4C with depth unpacked (the
    reference layout); used only for the exactness check."""
    n, h2, w2, d2, c8 = x8s.shape
    o = c8 // 8
    t = x8s.reshape(n, h2, w2, d2, 4, 2, o)     # (…, ab, g, o)
    t = t.transpose(0, 1, 2, 3, 5, 6, 4)        # (…, d2, g, o, ab)
    return t.reshape(n, h2, w2, 2 * d2, 4 * o)  # depth fine = 2*t + g


# ---------------------------------------------------------------- timing
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


GEOMS = {
    # decoder UpBlock conv1 shapes (packed channel-major activations)
    "L0 128x128x64 4Cin=128->64": (128, 128, 64, 32, 16),
    "L0b 128x128x64 4Cin=64->64": (128, 128, 64, 16, 16),
    "L1 64x64x64 4Cin=256->128": (64, 64, 64, 64, 32),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip8c", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)

    for name, (h2, w2, d, c, o) in GEOMS.items():
        x = jnp.asarray(rng.standard_normal((1, h2, w2, d, 4 * c)),
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, c, o)) * 0.05,
                        jnp.bfloat16)
        b = jnp.zeros((o,), jnp.bfloat16)
        orig_g = h2 * w2 * d * 4 * 27 * c * o * 2 / 1e12  # original TFLOP

        ref = jax.jit(lambda x, k, b: pc.packed_conv3d_stride1(
            x, pc.pack_kernel_stride1_jnp(k), pc.pack_bias_jnp(b)))(x, k, b)

        variants = [
            ("A dense dfold (prod)", lambda x, k, b: pc.packed_conv3d_stride1(
                x, pc.pack_kernel_stride1_jnp(k), pc.pack_bias_jnp(b)), 4.0),
            ("B sheared chmajor", lambda x, k, b:
                pc.packed_conv3d_stride1_sheared(
                    x, pc.pack_kernel_stride1_sheared_jnp(k),
                    pc.pack_bias_jnp(b)), 16 / 9),
            ("C sheared subpos", lambda x, k, b: sheared_subpos_conv(
                x, pack_kernel_sheared_subpos(k), b), 16 / 9),
            ("C' subpos nocvt", lambda x, k, b: sheared_subpos_conv(
                x, pack_kernel_sheared_subpos(k), b,
                to_channel_major=False), 16 / 9),
            ("Cd subpos dfold", lambda x, k, b: sheared_subpos_conv_dfold(
                x, pack_kernel_sheared_subpos(k), b), 16 / 9),
            ("Cd' dfold nocvt", lambda x, k, b: sheared_subpos_conv_dfold(
                x, pack_kernel_sheared_subpos(k), b,
                to_channel_major=False), 16 / 9),
        ]
        if not args.skip8c:
            variants += [
                ("D 8C sheared dfold", lambda x, k, b: sheared8_subpos_conv(
                    pack8(x), pack_kernel_sheared8_subpos(k), b,
                    dfold=True), 64 / 27),
                ("D' 8C sheared c3d", lambda x, k, b: sheared8_subpos_conv(
                    pack8(x), pack_kernel_sheared8_subpos(k), b,
                    dfold=False), 64 / 27),
            ]

        print(f"\n== {name}  (orig {orig_g * 1e3:.0f} GFLOP) ==", flush=True)
        for label, fn, infl in variants:
            got = jax.jit(fn)(x, k, b).astype(jnp.float32)
            if "nocvt" in label:
                diff = -1.0  # layout differs; checked via the cvt variant
            elif label.startswith("D"):
                back = subpos8_to_channel_major4(got)
                diff = float(jnp.max(jnp.abs(
                    back - ref.astype(jnp.float32))))
                assert diff < 0.15, f"{label} mismatch {diff}"
            else:
                diff = float(jnp.max(jnp.abs(
                    got - ref.astype(jnp.float32))))
                assert diff < 0.15, f"{label} mismatch {diff}"
            t = marginal(fn, x, k, b)
            print(f"{label:<22s} {t * 1e3:7.2f} ms   "
                  f"raw {orig_g * infl / t:6.1f} TF/s   "
                  f"useful {orig_g / t:5.1f} TF/s   maxdiff {diff:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
