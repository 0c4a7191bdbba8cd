"""On-chip A/B: fused Pallas canvas conv (ops/pallas_conv.py) vs the XLA
packed conv + IN + LeakyReLU units it replaces.

Chains of 3 conv+IN+act units at the eval-window L0/L1 geometries
(512x512x64 window), matching the decoder-spine shapes the round-3 trace
says dominate (docs/DESIGN.md round-4 ledger):

  L0 paired  : rows 32, 128x128, 8C = 128 lanes (DownBlock conv1 16->16)
  L0 dual    : two 128-lane inputs -> 128 (UpBlock concat conv)
  L1 folded  : rows 64, 64x64, 4C = 128 lanes (DownBlock conv1 32->32)

Prints ms per chain and the implied TF/s. Correctness is asserted on-chip
(bf16 tolerance) before timing.

    python experiments/pallas_conv_probe.py [hbo ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops import packed_conv as pc
from lintransunet_tpu.ops import pallas_conv as pcv
from lintransunet_tpu.ops.conv import leaky_relu

DT = jnp.bfloat16


def amortised(fn, *args, reps=4):
    def make(n):
        def looped(*a):
            def body(_, acc):
                perturbed = tuple(x + (0 * acc).astype(x.dtype) for x in a)
                out = fn(*perturbed)
                return sum(jnp.sum(l).astype(jnp.float32)
                           for l in jax.tree_util.tree_leaves(out))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return jax.jit(looped)

    lo, hi = make(reps), make(3 * reps)

    def best(f):
        float(f(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            times.append(time.perf_counter() - t0)
        return min(times)

    return (best(hi) - best(lo)) / (2 * reps) * 1e3


def report(name, ms, gflop):
    print(f"{name:<44s} {ms:8.3f} ms   {gflop / ms / 1e3:7.1f} TF/s",
          flush=True)


def l0_paired(hbo, n_chain=3):
    c, h, w, dp = 16, 128, 128, 32
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.standard_normal((dp, h, w, 8 * c)), DT)
    ks = [jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.05, DT)
          for _ in range(n_chain)]
    kps = [pc.pack_kernel_stride1_jnp(k) for k in ks]
    count = dp * h * w * 8
    # raw-FLOP count per conv: in-pair 9*(8C*8O) + boundary 2*9*(4C*4O)
    gflop = n_chain * dp * h * w * 9 * (128 * 128 + 64 * 64 * 2) * 2 / 1e9

    def xla_chain(x, *kp):
        for i in range(n_chain):
            x = pc.packed_conv3d_stride1_paired(x, kp[i], n_volumes=1)
            if i < n_chain - 1:
                x = leaky_relu(pc.group_instance_norm_paired(x, c))
        return x

    def fused_chain(x, *kp):
        xc = pcv.to_canvas(x, 1, hbo=hbo)
        affine = None
        for i in range(n_chain):
            want = i < n_chain - 1
            out = pcv.fused_s1_canvas(
                xc, kp[i], affine_a=affine, n_volumes=1, h=h, w=w,
                mode="paired", want_stats=want, hbo=hbo)
            if want:
                xc, stats = out
                sc, sh = pcv.stats_to_affine(stats, c, count, paired=True)
                affine = jnp.stack([sc, sh], axis=1)
            else:
                xc = out
        return pcv.from_canvas(xc, h, w, 1)

    ref = jax.jit(xla_chain)(x8, *kps)
    got = jax.jit(fused_chain)(x8, *kps)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    print(f"L0 paired hbo={hbo}: max abs err {err:.4f} "
          f"(rel {err / scale:.4f})", flush=True)
    report(f"L0 paired x{n_chain} XLA (conv+IN+act)",
           amortised(jax.jit(xla_chain), x8, *kps), gflop)
    report(f"L0 paired x{n_chain} FUSED hbo={hbo}",
           amortised(jax.jit(fused_chain), x8, *kps), gflop)


def l0_dual(hbo):
    c, h, w, dp = 16, 128, 128, 32
    rng = np.random.default_rng(1)
    a8 = jnp.asarray(rng.standard_normal((dp, h, w, 8 * c)), DT)
    b8 = jnp.asarray(rng.standard_normal((dp, h, w, 8 * c)), DT)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 2 * c, c)) * 0.05, DT)
    kp = pc.pack_kernel_stride1_jnp(k)
    gflop = dp * h * w * 9 * (256 * 128 + 128 * 64 * 2) * 2 / 1e9

    def xla(a, b, kp):
        return pc.packed_conv3d_stride1_paired(
            pc.concat_paired(a, b), kp, n_volumes=1)

    def fused(a, b, kp):
        y = pcv.fused_s1_canvas(
            pcv.to_canvas(a, 1, hbo=hbo), kp[:, :, :, :4 * c, :],
            xb=pcv.to_canvas(b, 1, hbo=hbo),
            packed_kernel_b=kp[:, :, :, 4 * c:, :],
            n_volumes=1, h=h, w=w, mode="paired", want_stats=False,
            hbo=hbo)
        return pcv.from_canvas(y, h, w, 1)

    ref = jax.jit(xla)(a8, b8, kp)
    got = jax.jit(fused)(a8, b8, kp)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"L0 dual hbo={hbo}: max abs err {err:.4f}", flush=True)
    report("L0 dual concat-conv XLA", amortised(jax.jit(xla), a8, b8, kp),
           gflop)
    report(f"L0 dual concat-conv FUSED hbo={hbo}",
           amortised(jax.jit(fused), a8, b8, kp), gflop)


def l1_folded(hbo, n_chain=3):
    c, h, w, d = 32, 64, 64, 64
    rng = np.random.default_rng(2)
    x4 = jnp.asarray(rng.standard_normal((d, h, w, 4 * c)), DT)
    ks = [jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.05, DT)
          for _ in range(n_chain)]
    kps = [pc.pack_kernel_stride1_jnp(k) for k in ks]
    count = d * h * w * 4
    gflop = n_chain * d * h * w * 27 * 128 * 128 * 2 / 1e9

    def xla_chain(x, *kp):
        for i in range(n_chain):
            x = pc.packed_conv3d_stride1_folded(x, kp[i], n_volumes=1,
                                                formulation="taps")
            if i < n_chain - 1:
                x = leaky_relu(pc.group_instance_norm_folded(x, c))
        return x

    def fused_chain(x, *kp):
        xc = pcv.to_canvas(x, 1, hbo=hbo)
        affine = None
        for i in range(n_chain):
            want = i < n_chain - 1
            out = pcv.fused_s1_canvas(
                xc, kp[i], affine_a=affine, n_volumes=1, h=h, w=w,
                mode="folded", want_stats=want, hbo=hbo)
            if want:
                xc, stats = out
                sc, sh = pcv.stats_to_affine(stats, c, count, paired=False)
                affine = jnp.stack([sc, sh], axis=1)
            else:
                xc = out
        return pcv.from_canvas(xc, h, w, 1)

    ref = jax.jit(xla_chain)(x4, *kps)
    got = jax.jit(fused_chain)(x4, *kps)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"L1 folded hbo={hbo}: max abs err {err:.4f}", flush=True)
    report(f"L1 folded x{n_chain} XLA (conv+IN+act)",
           amortised(jax.jit(xla_chain), x4, *kps), gflop)
    report(f"L1 folded x{n_chain} FUSED hbo={hbo}",
           amortised(jax.jit(fused_chain), x4, *kps), gflop)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    hbos = [int(a) for a in sys.argv[1:]] or [33]
    for hbo in hbos:
        l0_paired(hbo)
        l0_dual(hbo)
    for hbo in hbos:
        l1_folded(min(hbo, 33))


if __name__ == "__main__":
    main()
