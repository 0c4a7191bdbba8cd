"""Micro-probe: which in-kernel tap strategy sustains the best MXU rate?

One Pallas kernel per variant, grid (T,) with constant block indices (the
window loads into VMEM once, compute repeats T times) — measures pure
in-VMEM compute throughput of the conv-tap inner loop at the L0 paired
shape (window (3, Hbo+2, Wc, 128) -> out (Hbo*Wc, 128)).

Findings drive ops/pallas_conv.py's inner loop. Cost-model probe: edge
rows may be numerically off (clipped slices are zero-padded) — shapes and
alignment match the real kernel, numerics are checked elsewhere.

Run: python experiments/pallas_inner_probe.py [T] [hbo] [variants...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DT = jnp.bfloat16
L = 128
C4 = 64
NO = 128
WC = 136


def _dot(x, k):
    return jax.lax.dot_general(x, k, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _sl(buf, s, m):
    """Clipped slice [s, s+m) of buf rows, zero-padded back to m rows."""
    lo = max(0, -s)
    hi = max(0, s + m - buf.shape[0])
    part = buf[s + lo: s + m - hi]
    return part, lo, hi


def _dot_pad(buf, s, m, k):
    part, lo, hi = _sl(buf, s, m)
    y = _dot(part, k)
    if lo or hi:
        y = jnp.pad(y, ((lo, hi), (0, 0)))
    return y


def make_kernel(variant, hbo):
    m = hbo * WC
    rows_w = (hbo + 2) * WC

    def kernel(z_ref, kp_ref, ku_ref, kd_ref, out_ref, bscr=None):
        z2 = z_ref[...].reshape(3, rows_w, L)
        kp, ku, kd = kp_ref[...], ku_ref[...], kd_ref[...]
        acc = None
        if variant in ("base9", "dots9", "dots27"):
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    s = (1 + dh) * WC + (dw if variant != "base9" else 0)
                    part = _dot_pad(z2[1], s, m, kp[dh + 1, dw + 1])
                    if variant == "dots27":
                        up = _dot_pad(z2[0, :, C4:], s, m, ku[dh + 1, dw + 1])
                        dn = _dot_pad(z2[2, :, :C4], s, m, kd[dh + 1, dw + 1])
                        part = part + jnp.concatenate([up, dn], axis=-1)
                    acc = part if acc is None else acc + part
        elif variant in ("bext", "bext27"):
            zc = z2[1]
            b = jnp.concatenate(
                [zc[0:rows_w - 2], zc[1:rows_w - 1], zc[2:rows_w]], axis=-1)
            kp3 = jnp.stack(
                [jnp.concatenate([kp[h, 0], kp[h, 1], kp[h, 2]], axis=0)
                 for h in range(3)])  # (3, 3L, NO)
            for dh in (-1, 0, 1):
                s = (1 + dh) * WC - 1
                part = _dot_pad(b, s, m, kp3[dh + 1])
                acc = part if acc is None else acc + part
            if variant == "bext27":
                for dh in (-1, 0, 1):
                    for dw in (-1, 0, 1):
                        s = (1 + dh) * WC + dw
                        up = _dot_pad(z2[0, :, C4:], s, m, ku[dh + 1, dw + 1])
                        dn = _dot_pad(z2[2, :, :C4], s, m, kd[dh + 1, dw + 1])
                        acc = acc + jnp.concatenate([up, dn], axis=-1)
            else:
                bu = jnp.concatenate(
                    [z2[0, 0:rows_w - 2, C4:], z2[0, 1:rows_w - 1, C4:],
                     z2[0, 2:rows_w, C4:]], axis=-1)
                ku3 = jnp.stack(
                    [jnp.concatenate([ku[h, 0], ku[h, 1], ku[h, 2]], axis=0)
                     for h in range(3)])
                bd = jnp.concatenate(
                    [z2[2, 0:rows_w - 2, :C4], z2[2, 1:rows_w - 1, :C4],
                     z2[2, 2:rows_w, :C4]], axis=-1)
                kd3 = jnp.stack(
                    [jnp.concatenate([kd[h, 0], kd[h, 1], kd[h, 2]], axis=0)
                     for h in range(3)])
                up = dn = None
                for dh in (-1, 0, 1):
                    s = (1 + dh) * WC - 1
                    pu = _dot_pad(bu, s, m, ku3[dh + 1])
                    pd = _dot_pad(bd, s, m, kd3[dh + 1])
                    up = pu if up is None else up + pu
                    dn = pd if dn is None else dn + pd
                acc = acc + jnp.concatenate([up, dn], axis=-1)
        elif variant.startswith("chunk"):
            mc = int(variant[5:])  # chunk rows
            outs = []
            for c0 in range(0, m, mc):
                accc = None
                for dh in (-1, 0, 1):
                    for dw in (-1, 0, 1):
                        s = (1 + dh) * WC + dw + c0
                        part = _dot_pad(z2[1], s, mc, kp[dh + 1, dw + 1])
                        up = _dot_pad(z2[0, :, C4:], s, mc,
                                      ku[dh + 1, dw + 1])
                        dn = _dot_pad(z2[2, :, :C4], s, mc,
                                      kd[dh + 1, dw + 1])
                        part = part + jnp.concatenate([up, dn], axis=-1)
                        accc = part if accc is None else accc + part
                outs.append(accc)
            acc = jnp.concatenate(outs, axis=0)
        elif variant in ("kext", "kext_s"):
            # lane-concat K-extension: ze (rows, 2L) = [center | prev_g1 |
            # next_g0]; one K=2L dot per tap against the stacked
            # [pair; blockdiag-boundary] kernel (prebuilt host-side,
            # passed as kp). Lane concat of UNSHIFTED views (the sublane
            # shifts happen at the dot operand slice, which dots9 showed
            # is free).
            ke = kp  # (3, 3, 2L, NO) — see run()
            if variant == "kext_s":
                bscr[:, :L] = z2[1]
                bscr[:, L:L + C4] = z2[0, :, C4:]
                bscr[:, L + C4:] = z2[2, :, :C4]
                ze = bscr[...]
            else:
                ze = jnp.concatenate(
                    [z2[1], z2[0, :, C4:], z2[2, :, :C4]], axis=-1)
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    s = (1 + dh) * WC + dw
                    part = _dot_pad(ze, s, m, ke[dh + 1, dw + 1])
                    acc = part if acc is None else acc + part
        elif variant == "dotk1152":
            z1 = z2[1]
            bke = jnp.concatenate([kp[h, w] for h in range(3)
                                   for w in range(3)], axis=0)
            acc = _dot(z1[0:m], bke[:, :NO])
            for c0 in range(1, 9):
                # reuse the same rows as a stand-in 9L operand: 9 dots of
                # the SAME aligned block emulate one K=1152 dot's MACs with
                # per-dot acc adds -- upper-bound check handled by bext_s
                acc = acc + _dot(z1[0:m], kp[c0 // 3, c0 % 3])
        elif variant == "bext_s":
            # scratch-assembled B (rows-2, 3L): aligned stores normalise
            # the sublane-shifted sources, then 3 aligned-offset K=3L dots
            for j, sh in enumerate((0, 1, 2)):
                bscr[:, j * L:(j + 1) * L] = z2[1, sh:rows_w - 2 + sh]
            b = bscr[...]
            kp3 = jnp.stack(
                [jnp.concatenate([kp[h, 0], kp[h, 1], kp[h, 2]], axis=0)
                 for h in range(3)])
            for dh in (-1, 0, 1):
                s = (1 + dh) * WC - 1
                part = _dot_pad(b, s, m, kp3[dh + 1])
                acc = part if acc is None else acc + part
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    s = (1 + dh) * WC + dw
                    up = _dot_pad(z2[0, :, C4:], s, m, ku[dh + 1, dw + 1])
                    dn = _dot_pad(z2[2, :, :C4], s, m, kd[dh + 1, dw + 1])
                    acc = acc + jnp.concatenate([up, dn], axis=-1)
        elif variant == "im2col":
            zc = z2[1]
            b = jnp.concatenate(
                [zc[0:rows_w - 2], zc[1:rows_w - 1], zc[2:rows_w]], axis=-1)
            bp = jnp.pad(b, ((1, 2), (0, 0)))
            b2 = jnp.concatenate(
                [bp[0:m], bp[WC:WC + m], bp[2 * WC:2 * WC + m]], axis=-1)
            k9 = jnp.concatenate(
                [kp[h, w] for h in range(3) for w in range(3)], axis=0)
            acc = _dot(b2, k9)
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    s = (1 + dh) * WC + dw
                    up = _dot_pad(z2[0, :, C4:], s, m, ku[dh + 1, dw + 1])
                    dn = _dot_pad(z2[2, :, :C4], s, m, kd[dh + 1, dw + 1])
                    acc = acc + jnp.concatenate([up, dn], axis=-1)
        out_ref[0] = acc.astype(DT)

    return kernel


def run(variant, t_reps, hbo):
    m = hbo * WC
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((3, hbo + 2, WC, L)), DT)
    kp = jnp.asarray(rng.standard_normal((3, 3, L, NO)) * 0.05, DT)
    ku = jnp.asarray(rng.standard_normal((3, 3, C4, C4)) * 0.05, DT)
    kd = jnp.asarray(rng.standard_normal((3, 3, C4, C4)) * 0.05, DT)

    if variant.startswith("kext"):
        ke = np.zeros((3, 3, 2 * L, NO), np.float32)
        ke[:, :, :L] = np.asarray(kp, np.float32)
        ke[:, :, L:L + C4, :C4] = np.asarray(ku, np.float32)
        ke[:, :, L + C4:, C4:] = np.asarray(kd, np.float32)
        kp = jnp.asarray(ke, DT)

    scratch = []
    if variant == "bext_s":
        scratch = [pltpu.VMEM(((hbo + 2) * WC - 2, 3 * L), DT)]
    elif variant == "kext_s":
        scratch = [pltpu.VMEM(((hbo + 2) * WC, 2 * L), DT)]
    import functools as _ft
    kern = make_kernel(variant, hbo)
    if not scratch:
        kern = (lambda k: (lambda a, b, c, d, o: k(a, b, c, d, o)))(kern)
    kL = kp.shape[2]

    def build(reps):
        return pl.pallas_call(
            kern,
            scratch_shapes=scratch,
            grid=(reps,),
            in_specs=[
                pl.BlockSpec((3, hbo + 2, WC, L), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, kL, NO), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, C4, C4), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, C4, C4), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m, NO), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, m, NO), DT),
        )

    fn, fn3 = build(t_reps), build(3 * t_reps)

    def best(f):
        jf = jax.jit(lambda *a: f(*a))
        float(jnp.sum(jf(z, kp, ku, kd).astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(jf(z, kp, ku, kd).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per = (best(fn3) - best(fn)) / (2 * t_reps)
    full = variant not in ("base9", "dots9")
    gf = m * 9 * (L * NO + (2 * C4 * C4 if full else 0)) * 2 / 1e9
    print(f"{variant:<8s} hbo={hbo:<3d} {per * 1e6:8.1f} us/step  "
          f"{gf * 1e9 / per / 1e12:7.1f} TF/s", flush=True)


def main():
    t_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    hbo = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    variants = sys.argv[3:] or ["base9", "dots27", "bext_s"]
    for v in variants:
        try:
            run(v, t_reps, hbo)
        except Exception as e:  # noqa: BLE001
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
