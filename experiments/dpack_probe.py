"""DEPTH-MAJOR packing (dpack) probe — the round-4 formulation candidate.

The shipping formulation lane-fills the MXU with a 2x2 SPATIAL pack
(ops/packed_conv.py): a 3x3x3 conv on the packed grid costs 4x the
original FLOPs (the packed kernel is only 25% non-zero), and at L0 the
paired (8C) layout spends it at the K=N=128 rate. docs/DESIGN.md §10 puts
this dense-4x formulation's whole-window ceiling at ~440-470 patches/s —
below the 500 north star.

Packing DEPTH into lanes instead (p = 128/C consecutive slices) reaches
the same K=N=128 contraction at inflation p/3 + O(1/p) boundary taps:

  level  C   p  in-block   boundary   total    vs shipping
  L0     16  8  8/3=2.67x  ~0.06x     ~2.73x   4.00x  (1.47x fewer FLOPs)
  L1     32  4  4/3=1.33x  ~0.11x     ~1.44x   4.00x  (2.8x fewer)

(The in-block (3,3,pC,pO) kernel is (3p-2)/p^2 dense — more zeros than the
2x2 pack per MAC, but fewer MACs total because the 2x2 pack inflates the
DEPTH taps and the boundary convs too.) H/W stay real spatial dims, so the
2x2 fold/unfold seams (the round-3 copy budget) disappear; only a
depth<->lane transpose remains at the ROIBridge crossing.

This probe races the 3-conv (conv+IN+lrelu) chain per level:
  A  shipping   L0: paired 8C, L1: folded 4C (formulation auto)
  B  dpack      (N*Db, H, W, pC) in-block conv + 2 tiny boundary convs

with an on-device equivalence check against the folded path first.

Run on the v5e chip:  python experiments/dpack_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lintransunet_tpu import ops
from lintransunet_tpu.ops import packed_conv as pc
from experiments.folded_chain_bench import marginal, N_CONVS


# ---------------------------------------------------------------- dpack ops

def dpack(x5: jnp.ndarray, p: int) -> jnp.ndarray:
    """(N, H, W, D, C) -> (N*Db, H, W, p*C), lane = g*C + c (g-major)."""
    n, h, w, d, c = x5.shape
    assert d % p == 0
    x = x5.reshape(n, h, w, d // p, p, c)
    x = x.transpose(0, 3, 1, 2, 4, 5)
    return x.reshape(n * (d // p), h, w, p * c)


def dunpack(xr: jnp.ndarray, p: int, n: int = 1) -> jnp.ndarray:
    nb, h, w, pc_ = xr.shape
    c = pc_ // p
    x = xr.reshape(n, nb // n, h, w, p, c)
    x = x.transpose(0, 2, 3, 1, 4, 5)
    return x.reshape(n, h, w, (nb // n) * p, c)


def dpack_kernel_s1(kernel: jnp.ndarray, p: int) -> jnp.ndarray:
    """(3, 3, 3, C, O) -> in-block (3, 3, pC, pO).

    Block (g_in, g_out) holds depth tap kd = g_in - g_out + 1 when
    |g_in - g_out| <= 1, else zero."""
    kh, kw, kd, c, o = kernel.shape
    assert kd == 3
    z = jnp.zeros((kh, kw, c, o), kernel.dtype)
    rows = []
    for g_in in range(p):
        blocks = []
        for g_out in range(p):
            tap = g_in - g_out + 1
            blocks.append(kernel[:, :, tap] if 0 <= tap <= 2 else z)
        rows.append(jnp.concatenate(blocks, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def dpack_conv3d_s1(xr: jnp.ndarray, kernel, bias=None, p: int = 8,
                    n_volumes: int = 1,
                    boundary: str = "wide") -> jnp.ndarray:
    """3x3x3 stride-1 conv on the dpack layout.

    xr: (N*Db, H, W, pC); kernel: raw (3, 3, 3, C, O). In-block dense conv
    + two boundary taps (kd=0 for g_out=0 reading g_in=p-1 of block b-1;
    kd=2 for g_out=p-1 reading g_in=0 of block b+1).

    boundary="narrow": the taps run as (3,3,C,O) convs on single-slice
    views — minimal MACs but K=O=C (1/64 MXU fill at C=16: a measured
    0.8 ms each at L0, dominating the whole conv). "wide": zero-pad the
    tap kernels to full-K (3,3,pC,O) and run them on row-shifted FULL-lane
    views — 8x the MACs at the in-block conv's ~155 TF/s rate, ~6x faster.
    """
    k = kernel.astype(xr.dtype)
    nb, h, w, pc_ = xr.shape
    c = pc_ // p
    o = k.shape[-1]
    db = nb // n_volumes

    y = jax.lax.conv_general_dilated(
        xr, dpack_kernel_s1(k, p), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x5 = xr.reshape(n_volumes, db, h, w, pc_)
    if boundary == "wide":
        prev = jnp.pad(x5[:, :-1],
                       ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        nxt = jnp.pad(x5[:, 1:],
                      ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        zk = jnp.zeros((3, 3, (p - 1) * c, o), k.dtype)
        kup = jnp.concatenate([zk, k[:, :, 0]], axis=2)  # reads g_in = p-1
        kdn = jnp.concatenate([k[:, :, 2], zk], axis=2)  # reads g_in = 0
        up = jax.lax.conv_general_dilated(
            prev.reshape(nb, h, w, pc_), kup, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        dn = jax.lax.conv_general_dilated(
            nxt.reshape(nb, h, w, pc_), kdn, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        prev_last = jnp.pad(x5[:, :-1, :, :, (p - 1) * c:],
                            ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        next_first = jnp.pad(x5[:, 1:, :, :, :c],
                             ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        up = jax.lax.conv_general_dilated(
            prev_last.reshape(nb, h, w, c), k[:, :, 0], (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        dn = jax.lax.conv_general_dilated(
            next_first.reshape(nb, h, w, c), k[:, :, 2], (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + jnp.concatenate(
        [up, jnp.zeros(up.shape[:-1] + ((p - 2) * o,), y.dtype), dn], axis=-1)
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), (p,))
    return y


def group_instance_norm_dpack(xr: jnp.ndarray, channels: int, p: int,
                              n_volumes: int = 1,
                              eps: float = 1e-5) -> jnp.ndarray:
    """IN stats per (volume, channel) pooling (blocks, H, W, g)."""
    nb, h, w, pc_ = xr.shape
    db = nb // n_volumes
    x32 = xr.astype(jnp.float32).reshape(n_volumes, db, h, w, p, channels)
    mean, rstd = pc.moment_stats(x32, (1, 2, 3, 4), eps)
    out = (x32 - mean) * rstd
    return out.reshape(nb, h, w, pc_).astype(xr.dtype)


# ------------------------------------------------------------------ chains

def chain_dpack(xr, k, b, p, boundary="wide"):
    c = k.shape[-2]
    for _ in range(N_CONVS):
        y = dpack_conv3d_s1(xr, k, b, p=p, boundary=boundary)
        xr = ops.leaky_relu(group_instance_norm_dpack(y, c, p))
    return xr


def chain_paired(x8, kp, bp):
    c = kp.shape[-1] // 4
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1_paired(x8, kp, bp, n_volumes=1)
        x8 = ops.leaky_relu(pc.group_instance_norm_paired(y, c, n_volumes=1))
    return x8


def chain_folded(xf, kp, bp):
    c = kp.shape[-1] // 4
    for _ in range(N_CONVS):
        y = pc.packed_conv3d_stride1_folded(xf, kp, bp, n_volumes=1)
        xf = ops.leaky_relu(pc.group_instance_norm_folded(y, c, n_volumes=1))
    return xf


GEOMS = {
    # native grid (H, W, D, C) after windows_embedding + shipping chain
    "L0 256x256x64 C16": (256, 256, 64, 16, "paired"),
    "L1 128x128x64 C32": (128, 128, 64, 32, "folded"),
}


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    for name, (h, w, d, c, ship) in GEOMS.items():
        o = c
        p = max(2, min(8, 128 // c))
        x5 = jnp.asarray(rng.standard_normal((1, h, w, d, c)), jnp.bfloat16)
        kraw = rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)
        braw = rng.standard_normal((o,)).astype(np.float32)
        k = jnp.asarray(kraw, jnp.bfloat16)
        b = jnp.asarray(braw, jnp.bfloat16)

        # shipping operands (packed grid = half spatial, 4C lanes)
        xpk = ops.windows_embedding(x5, 2)  # (1, h/2, w/2, d, 4C)
        xfold = pc.fold_depth(xpk)
        kp = jnp.asarray(pc.pack_kernel_stride1(kraw), jnp.bfloat16)
        bp = jnp.asarray(np.repeat(braw, 4), jnp.bfloat16)

        xr = dpack(x5, p)

        # --- equivalence: one dpack conv vs one folded conv, both vs raw
        y_d = dunpack(dpack_conv3d_s1(xr, k, b, p=p), p)
        y_f = pc.unfold_depth(
            pc.packed_conv3d_stride1_folded(xfold, kp, bp, n_volumes=1), 1)
        y_f = ops.windows_unembedding(y_f, 2)
        diff = float(jnp.max(jnp.abs(y_d.astype(jnp.float32)
                                     - y_f.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(y_f.astype(jnp.float32))))
        print(f"{name}: p={p} equivalence max|diff| {diff:.4f} "
              f"(scale {scale:.1f})")

        useful = 2 * h * w * d * 27 * c * o * N_CONVS
        t_d = marginal(lambda a1, a2, a3: chain_dpack(a1, a2, a3, p),
                       xr, k, b)
        if ship == "paired":
            x8 = pc.fold_pairs(xfold, 1)
            t_s = marginal(chain_paired, x8, kp, bp)
        else:
            t_s = marginal(chain_folded, xfold, kp, bp)
        print(f"{name}: shipping {t_s*1e3:7.2f} ms ({useful/t_s/1e12:5.1f} "
              f"useful TF/s)   dpack {t_d*1e3:7.2f} ms "
              f"({useful/t_d/1e12:5.1f} TF/s)   ratio {t_s/t_d:.2f}x")

        # --- decomposition: conv-only, in-block-only, stats-only
        def conv_only(a1, a2, a3):
            y = a1
            for _ in range(N_CONVS):
                y = dpack_conv3d_s1(y, a2, a3, p=p)
            return y

        def inblock_only(a1, a2):
            y = a1
            kk = dpack_kernel_s1(a2.astype(a1.dtype), p)
            for _ in range(N_CONVS):
                y = jax.lax.conv_general_dilated(
                    y, kk, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y

        def stats_only(a1):
            y = a1
            for _ in range(N_CONVS):
                y = ops.leaky_relu(group_instance_norm_dpack(y, c, p))
            return y

        def ship_conv_only(a1, a2, a3):
            y = a1
            for _ in range(N_CONVS):
                if ship == "paired":
                    y = pc.packed_conv3d_stride1_paired(y, a2, a3,
                                                        n_volumes=1)
                else:
                    y = pc.packed_conv3d_stride1_folded(y, a2, a3,
                                                        n_volumes=1)
            return y

        t_nar = marginal(lambda a1, a2, a3: chain_dpack(a1, a2, a3, p,
                                                        "narrow"), xr, k, b)
        t_n = marginal(stats_only, xr)
        print(f"{name}: dpack-wide chain {t_d*1e3:6.2f}  narrow chain "
              f"{t_nar*1e3:6.2f}  stats-only {t_n*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
