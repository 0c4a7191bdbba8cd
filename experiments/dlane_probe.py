"""GO/NO-GO probe: DEPTH-LANE conv formulation vs the shipping packed ones.

The packed 2x2 H/W-lane formulation inflates stride-1 MACs 4x (dense
pack) / 16/9x (sheared); the ledger's roofline analysis
(docs/DESIGN.md round-4) shows the L1-class units already at ~88% MXU
peak, so the packed-dense formulation ceilings the headline at ~440-470.

Depth-lane packs G consecutive DEPTHS into lanes instead (rows = N*D/G,
H/W stay unpacked): the 3x3x3 conv becomes one plain NHWC 3x3 2D conv
whose (G*C, G*O) kernel is block-BANDED over (g_in, g_out) (3 diagonals
= the depth taps) plus two half-lane boundary taps across row
neighbours. MAC inflation = (G^2 + 2) / (3G):

  L1: C=32, G=4 -> 128 lanes, 1.50x  (vs 4.00x shipping dense-packed)
  L0: C=16, G=8 -> 128 lanes, 2.75x  (vs 16/9x-but-off-roofline shipping
                                      sheared-paired, measured ~3 ms/conv)

Chains of 3 conv+IN+LeakyReLU at the eval-window geometries, logical
(useful) GFLOPs as the comparator. Bit-identity asserted vs the shipping
path before timing.

    python experiments/dlane_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.ops import packed_conv as pc
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
    print(f"{name:<46s} {ms:8.3f} ms   {gflop / ms / 1e3:7.1f} TF/s useful",
          flush=True)


def conv2d(x, k, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dlane_kernel(k, G):
    """(3, 3, 3, C, O) -> (3, 3, G*C, G*O) block-banded over (g_in, g_out):
    block (gi, go) = depth tap gi - go + 1 (in-row taps only)."""
    kh, kw, kd, c, o = k.shape
    z = jnp.zeros_like(k[:, :, 0])
    cols = []
    for go in range(G):
        col = [k[:, :, gi - go + 1] if 0 <= gi - go + 1 <= 2 else z
               for gi in range(G)]
        cols.append(jnp.concatenate(col, axis=-2))   # stack g_in
    return jnp.concatenate(cols, axis=-1)            # stack g_out


def fold_dlane(xf, G, n_volumes=1):
    """Folded unpacked (N*D, H, W, C) -> depth-lane (N*D/G, H, W, G*C),
    lane = g*C + c (g-major)."""
    nd, h, w, c = xf.shape
    d = nd // n_volumes
    x = xf.reshape(n_volumes * (d // G), G, h, w, c)
    return x.transpose(0, 2, 3, 1, 4).reshape(
        n_volumes * (d // G), h, w, G * c)


def unfold_dlane(xg, G, n_volumes=1):
    ng, h, w, gc = xg.shape
    x = xg.reshape(ng, h, w, G, gc // G)
    return x.transpose(0, 3, 1, 2, 4).reshape(ng * G, h, w, gc // G)


def dlane_conv_s1(x, k, G, n_volumes=1):
    """3x3x3 stride-1 conv on the depth-lane layout. k: (3,3,3,C,O)."""
    rows, h, w, gc = x.shape
    c = gc // G
    o = k.shape[-1]
    y = conv2d(x, dlane_kernel(k, G))
    # boundary depth taps across row neighbours
    if n_volumes == 1:
        prev = jnp.pad(x[:-1, :, :, (G - 1) * c:],
                       ((1, 0), (0, 0), (0, 0), (0, 0)))
        nxt = jnp.pad(x[1:, :, :, :c], ((0, 1), (0, 0), (0, 0), (0, 0)))
    else:
        dg = rows // n_volumes
        x5 = x.reshape(n_volumes, dg, h, w, gc)
        prev = jnp.pad(x5[:, :-1, :, :, (G - 1) * c:],
                       ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
                       ).reshape(rows, h, w, c)
        nxt = jnp.pad(x5[:, 1:, :, :, :c],
                      ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))
                      ).reshape(rows, h, w, c)
    up = conv2d(prev, k[:, :, 0])          # -> g_out = 0
    dn = conv2d(nxt, k[:, :, 2])           # -> g_out = G-1
    y = y + jnp.pad(up, ((0, 0), (0, 0), (0, 0), (0, (G - 1) * o)))
    y = y + jnp.pad(dn, ((0, 0), (0, 0), (0, 0), ((G - 1) * o, 0)))
    return y


def dlane_instance_norm(x, G, n_volumes=1, eps=1e-5):
    rows, h, w, gc = x.shape
    c = gc // G
    dg = rows // n_volumes
    return pc._lane_norm(
        x, n_volumes,
        pool=lambda s: s.reshape(-1, G, c).sum(1),
        tile=lambda m: jnp.tile(m, (1, G)),
        count=G * dg * h * w, eps=eps)


def chain_case(name, c, o, h, w, d, G, n_chain=3, ship="dense"):
    """Compare a 3x(conv+IN+act) chain: shipping packed vs depth-lane."""
    rng = np.random.default_rng(0)
    # logical useful GF of the chain (first conv c->o, then o->o)
    gf = 0.0
    ks = []
    cin = c
    for i in range(n_chain):
        ks.append(jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, o)) * 0.05, DT))
        gf += 2 * h * w * d * 27 * cin * o / 1e9
        cin = o

    # shipping path operates on the H/W-packed folded/paired layout
    xf_unpacked = jnp.asarray(rng.standard_normal((d, h, w, c)), DT)
    xfp = pc.pack_folded(xf_unpacked)            # (d, h/2, w/2, 4c)

    if ship == "paired_sheared":
        x_ship = pc.fold_pairs(xfp, 1)

        def ship_chain(x, *kraw):
            for i, k in enumerate(kraw):
                ks_ = pc.pack_kernel_stride1_sheared_jnp(k)
                x = pc.packed_conv3d_stride1_sheared_paired(x, ks_,
                                                            n_volumes=1)
                ch = k.shape[-1]
                x = leaky_relu(pc.group_instance_norm_paired(x, ch,
                                                             n_volumes=1))
            return x
    elif ship == "paired_pads":
        # the SHIPPING default for narrow levels (PAIRED_S1=pads)
        x_ship = pc.fold_pairs(xfp, 1)

        def ship_chain(x, *kraw):
            for i, k in enumerate(kraw):
                kp = pc.pack_kernel_stride1_jnp(k)
                x = pc.packed_conv3d_stride1_paired(x, kp, n_volumes=1)
                ch = k.shape[-1]
                x = leaky_relu(pc.group_instance_norm_paired(x, ch,
                                                             n_volumes=1))
            return x
    else:
        x_ship = xfp

        def ship_chain(x, *kraw):
            for i, k in enumerate(kraw):
                kp = pc.pack_kernel_stride1_jnp(k)
                x = pc.packed_conv3d_stride1_folded(
                    x, kp, n_volumes=1, formulation="taps")
                ch = k.shape[-1]
                x = leaky_relu(pc.group_instance_norm_folded(x, ch,
                                                             n_volumes=1))
            return x

    # depth-lane
    xg = fold_dlane(xf_unpacked, G, 1)

    def dlane_chain(x, *kraw):
        for k in kraw:
            x = dlane_conv_s1(x, k, G, n_volumes=1)
            x = leaky_relu(dlane_instance_norm(x, G, n_volumes=1))
        return x

    ship_j = jax.jit(ship_chain)
    dlane_j = jax.jit(dlane_chain)

    # correctness: both equal the plain folded path up to bf16 noise
    ref = ship_j(x_ship, *ks)
    got = dlane_j(xg, *ks)
    if ship in ("paired_sheared", "paired_pads"):
        ref_u = pc.unpack_folded(pc.unfold_pairs(ref, 1))
    else:
        ref_u = pc.unpack_folded(ref)
    got_u = unfold_dlane(got, G, 1)
    err = float(jnp.max(jnp.abs(ref_u.astype(jnp.float32)
                                - got_u.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref_u.astype(jnp.float32)))) + 1e-6
    print(f"{name}: max abs err {err:.4f} (rel {err / scale:.4f})",
          flush=True)

    report(f"{name} SHIP ({ship})", amortised(ship_j, x_ship, *ks), gf)
    report(f"{name} DLANE (G={G})", amortised(dlane_j, xg, *ks), gf)

    # seam cost: enter+exit the dlane layout from folded-packed
    def dlane_seam_chain(xfp_, *kraw):
        x = fold_dlane(pc.unpack_folded(xfp_), G, 1)
        for k in kraw:
            x = dlane_conv_s1(x, k, G, n_volumes=1)
            x = leaky_relu(dlane_instance_norm(x, G, n_volumes=1))
        return pc.pack_folded(unfold_dlane(x, G, 1))

    report(f"{name} DLANE+seams", amortised(jax.jit(dlane_seam_chain),
                                            xfp, *ks), gf)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # L0 eval-window geometry: 256x256 spatial (post 2x2 embed), depth 64.
    # Shipping default is paired PADS (PAIRED_S1=pads), not sheared.
    chain_case("L0 3-chain c16 G8", 16, 16, 256, 256, 64, G=8,
               ship="paired_pads")
    chain_case("L0 3-chain c16 G4", 16, 16, 256, 256, 64, G=4,
               ship="paired_pads")
