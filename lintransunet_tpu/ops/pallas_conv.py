"""Fused Pallas TPU kernel for the packed stride-1 conv chains.

Round-4 formulation attack (VERDICT round-3 items 2 and 3). The round-3
trace decomposes one L0 paired conv+IN+act unit into FIVE XLA device
passes (~5.5 ms each on the 512x512x64 eval window):

  * the in-pair K=N=128 conv        (~1.7 ms, incl. fused stat reduce)
  * two pad fusions materialising the row-shifted half-lane boundary-tap
    inputs (fusion.5122-5128 family, ~1.6 ms)
  * two boundary-tap convs at K=64  (~1.6 ms)
  * the IN normalize multiply       (~0.6 ms)

plus, at the UpBlock concat, two ~1.2 ms minor-major copies
(copy.1211/1212). This kernel collapses the whole unit into ONE pass:

  y, stats[, z] = fused_s1_canvas(x, packed_kernel, ...)

  * input prologue: the PREVIOUS conv's InstanceNorm + LeakyReLU applied
    as a per-lane affine while the tile is already in VMEM (the stats come
    from the previous kernel's epilogue) — the normalized activation is
    never materialised in HBM;
  * conv taps as row-shifted FULL-WIDTH dots on a K-extended lane-concat
    operand ([center | prev_g1 | next_g0] in paired mode, the 3 depth
    slabs in folded): every (dh, dw) tap is ONE dot against the stacked
    [pair; block-diagonal boundary] kernel, so the boundary taps run at
    the MXU's full K instead of the 4C quarter rate;
  * window DMAs are double-buffered: each grid step issues the NEXT
    step's halo DMA before computing, hiding the HBM reads under the MXU;
  * epilogue: bias add + per-lane sum/sum-of-squares partials for the
    NEXT InstanceNorm (a VPU reduction overlapped with the MXU taps).

Layout: the "canvas" — a zero-framed view of the folded/paired layout
(ops/packed_conv.py) with one pad slab between volumes and a one-pixel
zero frame in H/W, so every tap read is in-bounds and every edge case
vanishes:

  canvas (S, Hc, Wc, L): S = n_volumes*(D+1)+1 depth slabs (slab s is a
  zero pad iff s % (D+1) == 0); H rows 1..H are data (row 0 and rows
  H+1.. are zero); W cols 1..W are data; Wc is padded to a multiple of 8
  so the (H, W) flatten is physically contiguous (sublane-exact).

Reference semantics: the packed/paired convs these kernels replace are
bit-compatible (up to f32 accumulation order) with
ops.packed_conv.packed_conv3d_stride1_{paired,folded}, i.e. with the
reference conv stack model/Unet_3Dblock.py:290-341,504-557; the fused
IN prologue matches utils of group_instance_norm_* (identical statistics,
applied as a per-lane affine).

Eval-only: no custom VJP — the training path keeps the XLA formulation
(the engine never routes train=True through this kernel).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lintransunet_tpu.ops import packed_conv as pc
from lintransunet_tpu.ops.pallas_attention import pallas_supported  # noqa: F401

LANE = 128
NEG_SLOPE = 0.01  # torch nn.LeakyReLU default, the reference's act

# Eval-path routing gate for the canvas kernel: "0" off, "1" on (TPU),
# "interpret" on with interpret-mode pallas (CPU tests). Frozen at import
# like the other trace-time knobs (ops/packed_conv.py rationale).
FUSED_S1_MODE = __import__("os").environ.get("LINTRANSUNET_FUSED_S1", "0")

# Region containment for the canvas kernel's layout boundary: barrier the
# canvas region's entry/exit tensors so XLA's layout assignment cannot
# re-plan NEIGHBOURING ops around the custom call's forced row-major
# operands — the round-4 embedded loss was ~12 ms/window of exactly that
# poisoning (docs/DESIGN.md round-4 canvas verdict; same failure mode and
# fix as the PEG layout leak, models/blocks.py).
FUSED_S1_BARRIER = __import__("os").environ.get(
    "LINTRANSUNET_FUSED_S1_BARRIER", "1") == "1"


def fused_s1_mode(train: bool, n_volumes, *lane_counts: int,
                  paired: bool = False) -> Optional[bool]:
    """None = keep the XLA path; False = run the Mosaic kernel; True =
    run it in interpret mode (CPU testing). Eval-only — the kernel has
    no custom VJP, training keeps the XLA formulation.

    ``lane_counts``: minor-dim widths of every canvas operand the caller
    would pass. The real Mosaic path requires each to be lane-exact
    (% 128): the kernel's manual halo DMAs slice an HBM memref, and
    Mosaic rejects sliced copies whose minor dim is below the (8, 128)
    tile (seen on the 32-lane paired input conv). Narrow units keep the
    XLA path; interpret mode (CPU tests) has no such constraint.

    Modes: "1" routes every lane-exact unit; "paired" routes ONLY the
    paired (8C) units — the round-4 chain probe showed the kernel wins
    in-body at the L0 paired geometry (-9%) but LOSES at the folded L1
    one (+33-55%), so region residency is only worth it at L0.
    """
    if train or n_volumes is None:
        return None
    if FUSED_S1_MODE == "interpret":
        return True
    if (FUSED_S1_MODE in ("1", "paired")
            and (paired or FUSED_S1_MODE == "1")
            and pallas_supported()
            and all(l % LANE == 0 for l in lane_counts)):
        return False
    return None


def pick_hbo(h: int, cap: int) -> Optional[int]:
    """Largest exact divisor of h+2 in [8, cap] — the dual-input kernel
    halves its row block to stay inside VMEM with two double-buffered
    input windows."""
    for cand in range(min(cap, h + 2), 7, -1):
        if (h + 2) % cand == 0:
            return cand
    return None


# Mosaic's scoped-vmem stack limit is 16 MiB; the estimate below tracks the
# real allocation to ~±40% (calibrated: folded la=256/no=128/wc=72/hbo=33
# estimated 15.1 MiB vs 20.9 MiB actual), so the budget leaves that margin.
FUSED_S1_VMEM_BUDGET = int(__import__("os").environ.get(
    "LINTRANSUNET_FUSED_S1_VMEM_KIB", str(10 * 1024))) * 1024


def est_vmem(hbo: int, w: int, *, la: int, no: int, lb: int = 0,
             paired: bool = True, affine_a: bool = False,
             affine_b: bool = False, want_z: bool = False,
             itemsize: int = 2) -> int:
    """Estimated kernel VMEM footprint (bytes) of one fused_s1_canvas call
    at row block ``hbo``: double-buffered halo scratch + K-extended tap
    operand + stacked tap kernel + f32 prologue temps + accumulator +
    double-buffered output block."""
    wc = _rup(w + 2, 8)
    kext = 2 if paired else 3
    total = 0
    for l, aff in ((la, affine_a), (lb, affine_b)):
        if not l:
            continue
        total += 2 * 3 * (hbo + 2) * wc * l * itemsize
        total += (hbo + 2) * wc * kext * l * itemsize
        total += 9 * kext * l * no * itemsize
        if aff:
            total += 3 * (hbo + 2) * wc * l * 4
    total += hbo * wc * no * 4
    total += 2 * hbo * wc * no * itemsize
    if want_z:
        total += 2 * hbo * wc * la * itemsize
    return total


def pick_hbo_vmem(h: int, w: int, units, itemsize: int = 2,
                  budget: Optional[int] = None) -> Optional[int]:
    """Largest canvas row block at which EVERY unit in ``units`` (dicts of
    est_vmem keywords) fits the scoped-vmem budget; None if none fits
    (callers keep the XLA path). Candidate order mirrors canvas_dims:
    exact divisors of h+2 in [8, 40] first, then near-divisors (<= 6
    padded rows), both descending — a block's calls must share one hbo so
    chained canvases agree on Hc."""
    budget = FUSED_S1_VMEM_BUDGET if budget is None else budget
    # floor at 8: smaller row blocks are sublane-misaligned and DMA-bound
    cands = [c for c in range(min(40, h + 2), 7, -1) if (h + 2) % c == 0]
    cands += [c for c in range(min(40, h + 2), 7, -1)
              if _rup(h + 2, c) - (h + 2) <= 6 and c not in cands]
    for c in cands:
        if all(est_vmem(c, w, itemsize=itemsize, **u) <= budget
               for u in units):
            return c
    return None


def apply_affine_leaky(y: jnp.ndarray, scale: jnp.ndarray,
                       shift: jnp.ndarray, n_volumes: int) -> jnp.ndarray:
    """LeakyReLU(y * scale + shift) with per-(volume, lane) affines from
    stats_to_affine — the chain-end InstanceNorm apply (mid-chain ones
    ride the next kernel's prologue)."""
    ndp = y.shape[0]
    dp = ndp // n_volumes
    y5 = y.astype(jnp.float32).reshape(n_volumes, dp, *y.shape[1:])
    z = y5 * scale[:, None, None, None, :] + shift[:, None, None, None, :]
    z = jnp.where(z >= 0, z, z * NEG_SLOPE)
    return z.reshape(y.shape).astype(y.dtype)


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# Canvas layout helpers (XLA side)
# --------------------------------------------------------------------------

def canvas_dims(h: int, w: int, d: int, n_volumes: int,
                hbo: Optional[int] = None) -> Tuple[int, int, int, int]:
    """(S, Hc, Wc, hbo) for a folded/paired (n*D, h, w, L) tensor."""
    s = n_volumes * (d + 1) + 1
    wc = _rup(w + 2, 8)
    if hbo is None:
        # prefer the largest EXACT divisor of h + 2 in [8, 40] (zero
        # padded-row waste: 26 at h=128, 33 at h=64); else the largest
        # block <= 40 rows that divides an Hc close to h + 2
        for cand in range(min(40, h + 2), 7, -1):
            if (h + 2) % cand == 0:
                hbo = cand
                break
        if hbo is None:
            for cand in range(min(40, h + 2), 2, -1):
                if _rup(h + 2, cand) - (h + 2) <= 6:
                    hbo = cand
                    break
        hbo = hbo or (h + 2)
    hc = _rup(h + 2, hbo)
    return s, hc, wc, hbo


def to_canvas(x: jnp.ndarray, n_volumes: int = 1,
              hbo: Optional[int] = None) -> jnp.ndarray:
    """Folded/paired (n*D, H, W, L) -> canvas (S, Hc, Wc, L).

    One XLA pad (fuses with the producer where possible). Zero slab
    between volumes and at both ends; one-pixel zero frame in H/W.
    """
    nd, h, w, l = x.shape
    if FUSED_S1_BARRIER:
        x = jax.lax.optimization_barrier(x)
    d = nd // n_volumes
    s, hc, wc, _ = canvas_dims(h, w, d, n_volumes, hbo)
    x5 = x.reshape(n_volumes, d, h, w, l)
    x5 = jnp.pad(x5, ((0, 0), (1, 0), (1, hc - h - 1), (1, wc - w - 1),
                      (0, 0)))
    xc = x5.reshape(n_volumes * (d + 1), hc, wc, l)
    return jnp.pad(xc, ((0, 1), (0, 0), (0, 0), (0, 0)))


def from_canvas(xc: jnp.ndarray, h: int, w: int,
                n_volumes: int = 1) -> jnp.ndarray:
    """Canvas (S, Hc, Wc, L) -> folded/paired (n*D, H, W, L)."""
    s, hc, wc, l = xc.shape
    d1 = (s - 1) // n_volumes
    x5 = xc[:-1].reshape(n_volumes, d1, hc, wc, l)
    x5 = x5[:, 1:, 1:h + 1, 1:w + 1, :]
    out = x5.reshape(n_volumes * (d1 - 1), h, w, l)
    if FUSED_S1_BARRIER:
        out = jax.lax.optimization_barrier(out)
    return out


def stats_to_affine(stats: jnp.ndarray, channels: int, count: int,
                    paired: bool, eps: float = 1e-5):
    """Kernel (n, 2, L) stat partials -> per-lane IN affine (scale, shift).

    Pools lanes per ORIGINAL channel exactly like group_instance_norm_*:
    paired lanes = g*4C + c*4 + sub pool over (g, sub); folded lanes =
    c*4 + sub pool over sub. ``count`` = valid elements per lane * lanes
    per group. Returns f32 (n, L) scale/shift with
    normalize(x) = x * scale + shift.
    """
    n, _, l = stats.shape
    if paired:
        grouped = stats.reshape(n, 2, 2, channels, 4).sum(axis=(2, 4))
    else:
        grouped = stats.reshape(n, 2, channels, 4).sum(axis=3)
    mean = grouped[:, 0] / count
    var = jnp.maximum(grouped[:, 1] / count - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    if paired:
        scale = jnp.tile(jnp.repeat(rstd, 4, axis=-1), (1, 2))
        mean_l = jnp.tile(jnp.repeat(mean, 4, axis=-1), (1, 2))
    else:
        scale = jnp.repeat(rstd, 4, axis=-1)
        mean_l = jnp.repeat(mean, 4, axis=-1)
    return scale, -mean_l * scale


# --------------------------------------------------------------------------
# The kernel
# --------------------------------------------------------------------------

def _issue_window(x_ref, scratch, sems, r, h0, hbo, hb, n_hb, s):
    """START the halo DMAs for window (r, hb) into a scratch buffer.

    scratch (3, hbo+2, Wc, L) gets canvas rows [h0-1, h0+hbo+1) of slabs
    r-1..r+1. Missing halo rows (grid edges) are zero-filled — identical
    to the canvas frame they fall outside of. The slab range is clamped
    for the always-pad r=0 / r=s-1 steps (their windows are never
    computed on, but the prefetcher issues them unconditionally)."""
    rc = jnp.clip(r, 1, s - 2)
    pltpu.make_async_copy(
        x_ref.at[pl.ds(rc - 1, 3), pl.ds(h0, hbo)],
        scratch.at[:, 1:hbo + 1], sems.at[0]).start()

    @pl.when(hb > 0)
    def _():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(rc - 1, 3), pl.ds(h0 - 1, 1)],
            scratch.at[:, 0:1], sems.at[1]).start()

    @pl.when(hb == 0)
    def _():
        scratch[:, 0:1] = jnp.zeros_like(scratch[:, 0:1])

    @pl.when(hb < n_hb - 1)
    def _():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(rc - 1, 3), pl.ds(h0 + hbo, 1)],
            scratch.at[:, hbo + 1:hbo + 2], sems.at[2]).start()

    @pl.when(hb == n_hb - 1)
    def _():
        scratch[:, hbo + 1:hbo + 2] = jnp.zeros_like(
            scratch[:, hbo + 1:hbo + 2])


def _wait_window(x_ref, scratch, sems, r, h0, hbo, hb, n_hb, s):
    """WAIT on the DMAs issued by _issue_window for the same (r, hb)
    (the descriptors are reconstructed — identical slices, same sems)."""
    rc = jnp.clip(r, 1, s - 2)
    pltpu.make_async_copy(
        x_ref.at[pl.ds(rc - 1, 3), pl.ds(h0, hbo)],
        scratch.at[:, 1:hbo + 1], sems.at[0]).wait()

    @pl.when(hb > 0)
    def _():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(rc - 1, 3), pl.ds(h0 - 1, 1)],
            scratch.at[:, 0:1], sems.at[1]).wait()

    @pl.when(hb < n_hb - 1)
    def _():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(rc - 1, 3), pl.ds(h0 + hbo, 1)],
            scratch.at[:, hbo + 1:hbo + 2], sems.at[2]).wait()


def _prologued(x3, affine_ref, cfg, r, h0):
    """act(x*scale + shift) * pad_mask over the (3, hbo+2, Wc, L) window
    value; the masks rebuild the canvas zero frame that the affine shift
    would otherwise pollute. Returns the window in compute dtype."""
    hbo, wc = cfg["hbo"], cfg["wc"]
    h, w, dp1 = cfg["h"], cfg["w"], cfg["d"] + 1
    scale = affine_ref[0, 0][None, None, :]   # (1, 1, L), f32
    shift = affine_ref[0, 1][None, None, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (hbo + 2, wc), 0) + (h0 - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hbo + 2, wc), 1)
    rcmask = ((rows >= 1) & (rows <= h) & (cols >= 1)
              & (cols <= w)).astype(jnp.float32)[:, :, None]
    outs = []
    for dr in range(3):
        x = x3[dr].astype(jnp.float32)
        z = x * scale + shift
        z = jnp.where(z >= 0, z, z * NEG_SLOPE)
        slab_ok = (((r - 1 + dr) % dp1) != 0).astype(jnp.float32)
        outs.append((z * (rcmask * slab_ok)).astype(cfg["cdtype"]))
    return jnp.stack(outs)


def _lane_ext(z3, cfg, la):
    """Window (3, hbo+2, Wc, La) -> the K-extended tap operand
    ((hbo+2)*Wc, KL): lane-concat of the tap sources so every tap is ONE
    full-width dot against the stacked kernel (see _prep_ke). Paired KL =
    2*La ([center | prev_g1 | next_g0]); folded KL = 3*La."""
    hbo, wc = cfg["hbo"], cfg["wc"]
    if cfg["paired"]:
        c4 = la // 2
        ze = jnp.concatenate(
            [z3[1], z3[0, :, :, c4:], z3[2, :, :, :c4]], axis=-1)
    else:
        ze = jnp.concatenate([z3[0], z3[1], z3[2]], axis=-1)
    return ze.reshape((hbo + 2) * wc, ze.shape[-1])


def _taps_ext(ze2, ke, cfg):
    """All 9 (dh, dw) conv taps as row-shifted full-K dots.

    ze2: ((hbo+2)*Wc, KL) K-extended operand; ke: (3, 3, KL, No).
    Returns (M, No) f32 with M = hbo*Wc. Corner overhang rows are clipped
    (they only feed zero-frame outputs, masked at the write)."""
    hbo, wc = cfg["hbo"], cfg["wc"]
    m = hbo * wc
    acc = None
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            s = (1 + dh) * wc + dw
            lo = max(0, -s)
            hi = max(0, s + m - ze2.shape[0])
            part = jax.lax.dot_general(
                ze2[s + lo: s + m - hi], ke[dh + 1, dw + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if lo or hi:
                part = jnp.pad(part, ((lo, hi), (0, 0)))
            acc = part if acc is None else acc + part
    return acc


def _build_kernel(cfg):
    hbo, wc, no = cfg["hbo"], cfg["wc"], cfg["no"]
    h, w, dp1, n_hb = cfg["h"], cfg["w"], cfg["d"] + 1, cfg["n_hb"]
    s = cfg["s"]
    dual = cfg["dual"]
    total = s * n_hb

    def kernel(*refs):
        i = 0
        xa_ref = refs[i]; i += 1
        xb_ref = None
        if dual:
            xb_ref = refs[i]; i += 1
        kea_ref = refs[i]; i += 1
        keb_ref = None
        if dual:
            keb_ref = refs[i]; i += 1
        aff_a = refs[i] if cfg["affine_a"] else None
        i += 1 if cfg["affine_a"] else 0
        aff_b = refs[i] if cfg["affine_b"] else None
        i += 1 if cfg["affine_b"] else 0
        bias_ref = refs[i] if cfg["bias"] else None
        i += 1 if cfg["bias"] else 0

        y_ref = refs[i]; i += 1
        stats_ref = refs[i] if cfg["stats"] else None
        i += 1 if cfg["stats"] else 0
        z_ref = refs[i] if cfg["zout"] else None
        i += 1 if cfg["zout"] else 0

        sa = refs[i]; i += 1
        sb = refs[i] if dual else None
        i += 1 if dual else 0
        sems_a = refs[i]; i += 1
        sems_b = refs[i] if dual else None

        r = pl.program_id(0)
        hb = pl.program_id(1)
        idx = r * n_hb + hb
        h0 = hb * hbo
        buf = jax.lax.rem(idx, 2)
        data_slab = (r % dp1) != 0

        # --- double-buffered prefetch: this step's window was issued by
        # the previous step (or right here at idx 0); issue the NEXT
        # step's window before computing so its DMA rides under the MXU.
        @pl.when(idx == 0)
        def _():
            _issue_window(xa_ref, sa.at[0], sems_a.at[0],
                          r, h0, hbo, hb, n_hb, s)
            if dual:
                _issue_window(xb_ref, sb.at[0], sems_b.at[0],
                              r, h0, hbo, hb, n_hb, s)

        last_hb = hb == n_hb - 1
        r1 = jnp.where(last_hb, r + 1, r)
        hb1 = jnp.where(last_hb, 0, hb + 1)
        h01 = hb1 * hbo
        nbuf = jax.lax.rem(idx + 1, 2)

        @pl.when(idx + 1 < total)
        def _():
            _issue_window(xa_ref, sa.at[nbuf], sems_a.at[nbuf],
                          r1, h01, hbo, hb1, n_hb, s)
            if dual:
                _issue_window(xb_ref, sb.at[nbuf], sems_b.at[nbuf],
                              r1, h01, hbo, hb1, n_hb, s)

        _wait_window(xa_ref, sa.at[buf], sems_a.at[buf],
                     r, h0, hbo, hb, n_hb, s)
        if dual:
            _wait_window(xb_ref, sb.at[buf], sems_b.at[buf],
                         r, h0, hbo, hb, n_hb, s)

        @pl.when(jnp.logical_not(data_slab))
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)
            if z_ref is not None:
                z_ref[...] = jnp.zeros_like(z_ref)

        if stats_ref is not None:
            # first step of each volume ((r-1) % dp1 == 0 is false at the
            # r == 0 pad slab: (-1) % dp1 == dp1 - 1)
            @pl.when(((r - 1) % dp1 == 0) & (hb == 0))
            def _():
                stats_ref[...] = jnp.zeros_like(stats_ref)

        @pl.when(data_slab)
        def _():
            def window(sref, aff, has_affine):
                x3 = sref[buf]
                if has_affine:
                    return _prologued(x3, aff, cfg, r, h0)
                return x3.astype(cfg["cdtype"])

            za3 = window(sa, aff_a, cfg["affine_a"])
            acc = _taps_ext(_lane_ext(za3, cfg, za3.shape[-1]),
                            kea_ref[...], cfg)
            if dual:
                zb3 = window(sb, aff_b, cfg["affine_b"])
                acc = acc + _taps_ext(_lane_ext(zb3, cfg, zb3.shape[-1]),
                                      keb_ref[...], cfg)
            if bias_ref is not None:
                acc = acc + bias_ref[0].astype(jnp.float32)[None]

            rows = jax.lax.broadcasted_iota(jnp.int32, (hbo, wc), 0) + h0
            cols = jax.lax.broadcasted_iota(jnp.int32, (hbo, wc), 1)
            mask = ((rows >= 1) & (rows <= h) & (cols >= 1)
                    & (cols <= w)).astype(jnp.float32)
            y32 = acc.reshape(hbo, wc, no) * mask[:, :, None]
            y = y32.astype(cfg["dtype"])
            y_ref[0] = y

            if stats_ref is not None:
                y32 = y.astype(jnp.float32)
                su = jnp.sum(y32, axis=(0, 1))
                sq = jnp.sum(y32 * y32, axis=(0, 1))
                stats_ref[0, 0, :] = stats_ref[0, 0, :] + su
                stats_ref[0, 1, :] = stats_ref[0, 1, :] + sq
            if z_ref is not None:
                z_ref[0] = za3[1, 1:hbo + 1].astype(z_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_volumes", "h", "w", "mode", "want_stats", "want_z",
                     "hbo", "interpret", "compute_dtype"))
def fused_s1_canvas(xa, packed_kernel, xb=None, packed_kernel_b=None,
                    bias=None, affine_a=None, affine_b=None, *,
                    n_volumes: int = 1, h: int, w: int,
                    mode: str = "paired", want_stats: bool = True,
                    want_z: bool = False, hbo: Optional[int] = None,
                    interpret: bool = False, compute_dtype=jnp.bfloat16):
    """Fused stride-1 packed conv on the canvas layout.

    xa: canvas (S, Hc, Wc, La). packed_kernel: dense pack (3, 3, 3, 4Ca,
    4O) (pack_kernel_stride1_jnp output); in dual mode the kernel is the
    CONCAT conv's (4Ca rows first, then packed_kernel_b's 4Cb rows —
    pass the full kernel split by input rows). affine_*: (n, 2, L) f32
    per-volume per-lane (scale, shift) applied as act(x*scale+shift)
    before the taps (the previous IN + LeakyReLU). Returns (y_canvas
    [, stats (n, 2, No) f32][, z_canvas]).
    """
    s, hc, wc, la = xa.shape
    d = (s - 1) // n_volumes - 1
    _, hc2, wc2, hbo_auto = canvas_dims(h, w, d, n_volumes, hbo)
    assert (hc, wc) == (hc2, wc2), (xa.shape, (hc2, wc2))
    hbo = hbo or hbo_auto
    assert hc % hbo == 0
    n_hb = hc // hbo
    paired = mode == "paired"

    dt = xa.dtype

    def prep(pk):
        """Dense pack (3,3,3,4C,4O) -> the K-extended tap kernel matching
        _lane_ext's operand: paired (3,3,2*8C,8O) = [pair; blockdiag
        boundary] stacked on K; folded (3,3,3*4C,4O) = the kd taps
        stacked on K."""
        pk = pk.astype(compute_dtype)
        if paired:
            return jnp.concatenate(
                [pc.pair_kernel_stride1_jnp(pk),
                 pc.pair_kernel_stride1_bd_jnp(pk)], axis=-2)
        return jnp.concatenate([pk[:, :, kd] for kd in range(3)], axis=-2)

    dual = xb is not None
    kea = prep(packed_kernel)
    keb = prep(packed_kernel_b) if dual else None
    no = kea.shape[-1]

    cfg = {
        "hbo": hbo, "wc": wc, "no": no, "h": h, "w": w, "d": d, "s": s,
        "n_hb": n_hb, "dual": dual, "paired": paired,
        "affine_a": affine_a is not None,
        "affine_b": affine_b is not None, "bias": bias is not None,
        "stats": want_stats, "zout": want_z, "dtype": dt,
        "cdtype": compute_dtype,
    }

    grid = (s, n_hb)
    in_arrays = [xa] + ([xb] if dual else [])
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(in_arrays)
    in_arrays.append(kea)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if dual:
        in_arrays.append(keb)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    dp1 = d + 1
    vmap_idx = lambda r, hb: (jnp.maximum(r, 1) - 1) // dp1  # noqa: E731
    for aff in (affine_a, affine_b):
        if aff is not None:
            in_arrays.append(aff.astype(jnp.float32))
            in_specs.append(pl.BlockSpec(
                (1, 2, aff.shape[-1]),
                lambda r, hb: (vmap_idx(r, hb), 0, 0),
                memory_space=pltpu.VMEM))
    if bias is not None:
        in_arrays.append(bias.astype(jnp.float32).reshape(1, -1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out_shape = [jax.ShapeDtypeStruct((s, hc, wc, no), dt)]
    out_specs = [pl.BlockSpec((1, hbo, wc, no),
                              lambda r, hb: (r, hb, 0, 0),
                              memory_space=pltpu.VMEM)]
    if want_stats:
        out_shape.append(
            jax.ShapeDtypeStruct((n_volumes, 2, no), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 2, no), lambda r, hb: (vmap_idx(r, hb), 0, 0),
            memory_space=pltpu.VMEM))
    if want_z:
        out_shape.append(jax.ShapeDtypeStruct((s, hc, wc, la), dt))
        out_specs.append(pl.BlockSpec((1, hbo, wc, la),
                                      lambda r, hb: (r, hb, 0, 0),
                                      memory_space=pltpu.VMEM))

    scratch = [pltpu.VMEM((2, 3, hbo + 2, wc, la), dt)]
    if dual:
        scratch.append(pltpu.VMEM((2, 3, hbo + 2, wc, xb.shape[-1]), dt))
    scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
    if dual:
        scratch.append(pltpu.SemaphoreType.DMA((2, 3)))

    out = pl.pallas_call(
        _build_kernel(cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*in_arrays)
    return out
