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
  * conv taps as row-shifted 2D matmuls on a flattened (rows, lanes) VMEM
    view — the boundary depth taps read the neighbour depth-slab halves
    directly from VMEM (no materialised shifted copies);
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
        # largest block <= 40 rows that divides an Hc close to h + 2
        hbo = None
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
    return x5.reshape(n_volumes * (d1 - 1), h, w, l)


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

def _dma_window(x_ref, scratch, sems, r, h0, hbo, hb, n_hb):
    """Fill scratch (3, hbo+2, Wc, L) with canvas rows [h0-1, h0+hbo+1) of
    slabs r-1..r+1. Missing halo rows (grid edges) are zero — identical to
    the canvas frame they fall outside of."""
    body = pltpu.make_async_copy(
        x_ref.at[pl.ds(r - 1, 3), pl.ds(h0, hbo)],
        scratch.at[:, 1:hbo + 1], sems.at[0])
    body.start()

    @pl.when(hb > 0)
    def _():
        top = pltpu.make_async_copy(
            x_ref.at[pl.ds(r - 1, 3), pl.ds(h0 - 1, 1)],
            scratch.at[:, 0:1], sems.at[1])
        top.start()
        top.wait()

    @pl.when(hb == 0)
    def _():
        scratch[:, 0:1] = jnp.zeros_like(scratch[:, 0:1])

    @pl.when(hb < n_hb - 1)
    def _():
        bot = pltpu.make_async_copy(
            x_ref.at[pl.ds(r - 1, 3), pl.ds(h0 + hbo, 1)],
            scratch.at[:, hbo + 1:hbo + 2], sems.at[2])
        bot.start()
        bot.wait()

    @pl.when(hb == n_hb - 1)
    def _():
        scratch[:, hbo + 1:hbo + 2] = jnp.zeros_like(
            scratch[:, hbo + 1:hbo + 2])

    body.wait()


def _prologue(scratch, affine_ref, cfg, r, h0):
    """Apply act((x*scale + shift)) * pad_mask in place on the scratch
    window; returns nothing (scratch holds z afterwards)."""
    hbo, wc = cfg["hbo"], cfg["wc"]
    h, w, dp1 = cfg["h"], cfg["w"], cfg["d"] + 1
    scale = affine_ref[0, 0][None, None, :]   # (1, 1, L), f32
    shift = affine_ref[0, 1][None, None, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (hbo + 2, wc), 0) + (h0 - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hbo + 2, wc), 1)
    rcmask = ((rows >= 1) & (rows <= h) & (cols >= 1)
              & (cols <= w)).astype(jnp.float32)[:, :, None]
    for dr in range(3):
        x = scratch[dr].astype(jnp.float32)
        z = x * scale + shift
        z = jnp.where(z >= 0, z, z * NEG_SLOPE)
        slab_ok = (((r - 1 + dr) % dp1) != 0).astype(jnp.float32)
        scratch[dr] = (z * (rcmask * slab_ok)).astype(scratch.dtype)


def _taps(z2, kernels, cfg, lane_lo=None, lane_hi=None):
    """Accumulate all conv taps for one input tensor.

    z2: (3, (hbo+2)*Wc, L) flattened prologued window.
    kernels: dict with 'pair' (3,3,8C,8O) + 'up'/'dn' (3,3,4C,4O) in
    paired mode, or 'full' (3,3,3,4C,4O) (kh, kw, kd order) in folded.
    Returns (M, No) f32 with M = hbo*Wc.
    """
    hbo, wc = cfg["hbo"], cfg["wc"]
    m = hbo * wc
    paired = "pair" in kernels
    acc = None
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            s = (1 + dh) * wc + dw
            # corner overhang: the clipped rows only feed zero-frame
            # outputs (masked at the write)
            lo_clip = max(0, -s)
            hi_clip = max(0, s + m - z2.shape[1])
            ln = m - lo_clip - hi_clip
            sl = s + lo_clip

            def dot(x, k):
                return jax.lax.dot_general(
                    x, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            if paired:
                part = dot(z2[1, sl:sl + ln], kernels["pair"][dh + 1, dw + 1])
                c4 = kernels["up"].shape[2]
                up = dot(z2[0, sl:sl + ln, c4:], kernels["up"][dh + 1, dw + 1])
                dn = dot(z2[2, sl:sl + ln, :c4], kernels["dn"][dh + 1, dw + 1])
                part = part + jnp.concatenate([up, dn], axis=-1)
            else:
                part = dot(z2[0, sl:sl + ln], kernels["full"][dh + 1, dw + 1, 0])
                part = part + dot(z2[1, sl:sl + ln],
                                  kernels["full"][dh + 1, dw + 1, 1])
                part = part + dot(z2[2, sl:sl + ln],
                                  kernels["full"][dh + 1, dw + 1, 2])
            if lo_clip or hi_clip:
                part = jnp.pad(part, ((lo_clip, hi_clip), (0, 0)))
            acc = part if acc is None else acc + part
    return acc


def _build_kernel(cfg):
    hbo, wc, no = cfg["hbo"], cfg["wc"], cfg["no"]
    h, w, dp1, n_hb = cfg["h"], cfg["w"], cfg["d"] + 1, cfg["n_hb"]
    dual = cfg["dual"]
    m = hbo * wc

    def kernel(*refs):
        i = 0
        xa_ref = refs[i]; i += 1
        xb_ref = None
        if dual:
            xb_ref = refs[i]; i += 1
        ka = {}
        for name in cfg["ka_names"]:
            ka[name] = refs[i][...]; i += 1
        kb = {}
        for name in cfg["kb_names"]:
            kb[name] = refs[i][...]; i += 1
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
        sems = refs[i]

        r = pl.program_id(0)
        hb = pl.program_id(1)
        h0 = hb * hbo
        data_slab = (r % dp1) != 0

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
            _dma_window(xa_ref, sa, sems, r, h0, hbo, hb, n_hb)
            if dual:
                _dma_window(xb_ref, sb, sems, r, h0, hbo, hb, n_hb)
            if cfg["affine_a"]:
                _prologue(sa, aff_a, cfg, r, h0)
            if dual and cfg["affine_b"]:
                _prologue(sb, aff_b, cfg, r, h0)

            za = sa[...].astype(cfg["cdtype"])
            za2 = za.reshape(3, (hbo + 2) * wc, za.shape[-1])
            acc = _taps(za2, ka, cfg)
            if dual:
                zb = sb[...].astype(cfg["cdtype"])
                zb2 = zb.reshape(3, (hbo + 2) * wc, zb.shape[-1])
                acc = acc + _taps(zb2, kb, cfg)
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
                z_ref[0] = sa[1, 1:hbo + 1]

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
        pk = pk.astype(compute_dtype)
        if paired:
            kp = pc.pair_kernel_stride1_jnp(pk)  # (3, 3, 8C, 8O)
            return {"pair": kp, "up": pk[:, :, 0], "dn": pk[:, :, 2]}
        # folded: (3,3,3,4C,4O) already (kh, kw, kd, I, O)
        return {"full": pk}

    dual = xb is not None
    if dual:
        ka_k = prep(packed_kernel)
        kb_k = prep(packed_kernel_b)
    else:
        ka_k, kb_k = prep(packed_kernel), {}
    no = (ka_k["pair"].shape[-1] if paired else ka_k["full"].shape[-1])

    cfg = {
        "hbo": hbo, "wc": wc, "no": no, "h": h, "w": w, "d": d,
        "n_hb": n_hb, "dual": dual, "affine_a": affine_a is not None,
        "affine_b": affine_b is not None, "bias": bias is not None,
        "stats": want_stats, "zout": want_z, "dtype": dt,
        "cdtype": compute_dtype,
        "ka_names": tuple(ka_k), "kb_names": tuple(kb_k),
    }

    grid = (s, n_hb)
    in_arrays = [xa] + ([xb] if dual else [])
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(in_arrays)
    for name in cfg["ka_names"]:
        in_arrays.append(ka_k[name])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    for name in cfg["kb_names"]:
        in_arrays.append(kb_k[name])
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

    scratch = [pltpu.VMEM((3, hbo + 2, wc, la), dt)]
    if dual:
        scratch.append(pltpu.VMEM((3, hbo + 2, wc, xb.shape[-1]), dt))
    scratch.append(pltpu.SemaphoreType.DMA((3,)))

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
