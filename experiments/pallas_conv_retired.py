"""RETIRED Pallas TPU kernel for the packed stride-1 3D convolution.

Retired from lintransunet_tpu/ops in round 3 per the no-shipped-kernel-
slower-than-XLA rule: measured 0.4-0.6x vs XLA's lowering of
ops.packed_conv.packed_conv3d_stride1 on v5e (docs/DESIGN.md round-2
ledger) — Mosaic still materialises the depth-tap slices, and the K=N<=64
MXU cap at L0 bounds any kernel to <=1.3x. Kept here as measured groundwork
for a future 8C-lane (K=N=128) variant, where the cap argument changes.


The packed (2x2 space-to-channel) stride-1 conv is the wall-clock core of
both the encoder and decoder at the top UNet levels (ops/packed_conv.py).
XLA lowers it at ~33-60 TFLOP/s raw on v5e; round-1 Pallas prototypes all
plateaued at ~28 raw because Mosaic materialises every tap's strided slice
as a VMEM copy (experiments/pallas_conv_prototype.py).

This kernel avoids per-tap copies almost entirely:

* the (TH+2, TW+2, D, 4C) spatial tile is viewed as a FLATTENED row matrix
  (rows = (h, w, d), minor = channels). An (dh, dw) tap is then a contiguous
  row-offset slice at offset (dh*(TW+2) + dw) * D — a multiple of D, and D
  is required to be a multiple of 8, so every H/W tap is a sublane-ALIGNED
  slice the MXU can read in place;
* only the DEPTH taps (offset +-1, never alignable) are materialised: three
  depth-shifted copies of the tile are built once per grid step in VMEM
  scratch (2 misaligned copies per step, vs 27 in the naive formulation);
* one zero guard row above and below the H halo keeps every tap slice
  in-bounds without clamping, so the inner loop is 27 unconditional
  dot(A_rows, W_tap) accumulations into an f32 accumulator.

The kernel computes outputs for the W halo columns too (garbage) and slices
them away at the store; that costs (TW+2)/TW extra FLOPs — the price of
keeping taps as pure row offsets.

Semantics == ops.packed_conv.packed_conv3d_stride1(xp, kernel, bias) for
kd=3 kernels (bit-level up to f32-accumulation reassociation). Verified in
interpret mode on CPU (tests/test_pallas_conv.py) and against XLA on the
chip.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *shifts, th, tw, d):
    """x_ref: (1, 1, TH+2, TW+2, D+2, C4) halo tile (depth-padded).

    shifts: three FLAT VMEM scratch buffers ((TH+4)*(TW+2)*D, C4) —
    depth-shifted copies of the tile with one zero guard H-row at top and
    bottom, so every (dh, dw) tap below is an in-bounds static row-offset
    slice. o_ref: (1, 1, TH, TW, D, O4).
    """
    c4 = x_ref.shape[-1]
    o4 = o_ref.shape[-1]
    tile = x_ref[0, 0]

    row_blk = (tw + 2) * d          # flat rows per H row
    m_out = th * row_blk
    # base: first output row (h=1, w=0) in the guarded flat layout (one
    # zero H-row prepended -> flat h index = 1 + h).
    base = 2 * row_blk

    for dp in range(3):
        buf = shifts[dp]
        zero = jnp.zeros((row_blk, c4), buf.dtype)
        buf[0:row_blk, :] = zero
        buf[(th + 3) * row_blk:(th + 4) * row_blk, :] = zero
        content = tile[:, :, dp:dp + d, :].reshape((th + 2) * row_blk, c4)
        buf[row_blk:(th + 3) * row_blk, :] = content

    # fori_loop over the 9 H/W taps per depth shift: a static unroll keeps
    # all 27 slice values live on the Mosaic stack simultaneously (~17 MB,
    # scoped-vmem OOM); the loop reuses one buffer. Offsets stay multiples
    # of D (sublane-aligned) — pl.multiple_of preserves the hint. The
    # offset is computed from the loop index (a table would be a captured
    # constant, which pallas kernels reject).
    acc = jnp.zeros((m_out, o4), jnp.float32)
    for dp in range(3):
        buf = shifts[dp]

        def tap(i, acc, buf=buf, dp=dp):
            dh = i // 3 - 1
            dw = i % 3 - 1
            off = pl.multiple_of(base + (dh * (tw + 2) + dw) * d, d)
            a = buf[pl.ds(off, m_out), :]
            return acc + jax.lax.dot(
                a, w_ref[dp, i], preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, 9, tap, acc)

    acc = acc + b_ref[:].astype(jnp.float32)[None, :]
    out = acc.reshape(th, tw + 2, d, o4)[:, 1:tw + 1]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _build_halo_tiles(xp: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """(1, H2, W2, D, C4) -> (nh, nw, TH+2, TW+2, D+2, C4) halo tiles."""
    _, h2, w2, d, c4 = xp.shape
    nh, nw = h2 // th, w2 // tw
    pad = jnp.pad(xp[0], ((1, 1), (1, 1), (1, 1), (0, 0)))
    rows = jnp.stack([
        jax.lax.slice_in_dim(pad, i * th, i * th + th + 2, axis=0)
        for i in range(nh)])
    tiles = jnp.stack([
        jax.lax.slice_in_dim(rows, j * tw, j * tw + tw + 2, axis=2)
        for j in range(nw)], axis=1)
    return tiles


def _tap_weights(packed_kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, C4, O4) -> (3, 9, C4, O4): [dp, dh*3 + dw] tap order."""
    c4, o4 = packed_kernel.shape[3], packed_kernel.shape[4]
    k = packed_kernel.transpose(2, 0, 1, 3, 4)  # (dp, dh, dw, C4, O4)
    return k.reshape(3, 9, c4, o4)


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def packed_conv3d_stride1_pallas(
    xp: jnp.ndarray,
    packed_kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    th: int = 8,
    tw: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas equivalent of packed_conv3d_stride1 (k=3, stride 1, pad 1).

    xp: (N, H2, W2, D, C4); packed_kernel: (3, 3, 3, C4, O4) — the output of
    pack_kernel_stride1_jnp; bias: (O4,) packed bias or None.
    Requires H2 % th == 0, W2 % tw == 0, D % 8 == 0.
    """
    n, h2, w2, d, c4 = xp.shape
    o4 = packed_kernel.shape[-1]
    if h2 % th or w2 % tw or d % 8:
        raise ValueError(f"shape {(h2, w2, d)} not tileable by ({th}, {tw}, 8)")
    if bias is None:
        bias = jnp.zeros((o4,), xp.dtype)
    w_taps = _tap_weights(packed_kernel).astype(xp.dtype)

    def one(x1):
        tiles = _build_halo_tiles(x1[None], th, tw)
        nh, nw = tiles.shape[0], tiles.shape[1]
        out = pl.pallas_call(
            functools.partial(_kernel, th=th, tw=tw, d=d),
            grid=(nh, nw),
            in_specs=[
                pl.BlockSpec((1, 1, th + 2, tw + 2, d + 2, c4),
                             lambda i, j: (i, j, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 9, c4, o4), lambda i, j: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((o4,), lambda i, j: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, th, tw, d, o4),
                                   lambda i, j: (i, j, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nh, nw, th, tw, d, o4), xp.dtype),
            scratch_shapes=[
                pltpu.VMEM(((th + 4) * (tw + 2) * d, c4), xp.dtype)
                for _ in range(3)
            ],
            interpret=interpret,
        )(tiles, w_taps, bias.astype(xp.dtype))
        # (nh, nw, TH, TW, D, O4) -> (H2, W2, D, O4)
        return out.transpose(0, 2, 1, 3, 4, 5).reshape(h2, w2, d, o4)

    return jax.vmap(one)(xp)
