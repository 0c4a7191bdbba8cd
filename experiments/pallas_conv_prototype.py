"""EXPERIMENT (round 1): Pallas conv3d prototype — runs, not yet faster.

Status on v5e via axon (2026-08-16): correct (bf16 reassociation-level diff
vs XLA) at ~56 TFLOP/s raw, but the depth-parity folding used to fill the
128 lanes doubles the FLOPs, landing at ~28 TFLOP/s-equivalent vs XLA's ~30.

What was learned (full notes in memory/tpu-conv-efficiency):
- naive halo BlockSpecs are wrong: index_map returns BLOCK indices, so
  overlapping windows need Element block dims (which compile but hit an
  opaque runtime FAILED_PRECONDITION through axon) or pre-materialised
  halo tiles (works; used here; costs ~6% traffic);
- Mosaic rejects concatenating sublane-shifted slices along lanes
  ("result/input offset mismatch on non-concat dimension") — use separate
  dots per depth tap;
- the split-weight variant (1.33x inflation: dense dp=1 block + two
  half-K dots for the quarter-dense dp=0/2 parities) was ALSO measured at
  ~28 TFLOP/s-equivalent — identical to the 2x-inflation version. The
  kernel is NOT MXU-bound: each of the 27 taps slices a shifted view of the
  VMEM tile, and Mosaic materialises every strided slice as a copy
  (~2 MB x 27 per tile = ~14 GB of VMEM copy traffic per conv), putting the
  op at ~67 FLOP/byte, far below the ~240 FLOP/byte v5e ridge. XLA's ~30
  TFLOP/s-equivalent appears to be the same memory-bound ceiling.
- also measured at the same ~28: hoisting the sublane-dim slice out of the
  tap loop, and replacing the (h, w, p) -> M reshape with a direct 4D
  dot_general (contraction over lanes only). The stability of 28 across
  four formulations suggests Mosaic's generated pipeline for this shape is
  the ceiling, matching XLA's own conv lowering (~30).
- round-2 path if conv perf must improve: an output-stationary
  row-streaming kernel with explicit double-buffered DMA and manual
  register-level reuse across taps — or accept that this conv shape is at
  its lowering ceiling and win elsewhere (fewer FLOPs via architecture-level
  choices, e.g. smaller eval windows at equal Dice).

Run directly: python experiments/pallas_conv_prototype.py (needs the TPU).
"""

import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 8, 16

def build_w(k):
    C = k.shape[3]
    W = np.zeros((3, 3, 3, 2 * C, 2 * C), np.float32)
    kn = np.asarray(k, np.float32)
    for dh in range(3):
        for dw in range(3):
            for dp in range(3):
                for qin in range(2):
                    for q in range(2):
                        dd = 2 * dp + qin - q - 1
                        if 0 <= dd <= 2:
                            W[dh, dw, dp, qin * C:(qin + 1) * C,
                              q * C:(q + 1) * C] = kn[dh, dw, dd]
    return W

def kernel(x_ref, w_ref, o_ref):
    # x_ref: (1, 1, TH+2, TW+2, P+2, 2C); o_ref: (1, 1, TH, TW, P, 2C)
    xv = x_ref[0, 0]
    _, _, pp2, c2 = xv.shape
    p = pp2 - 2
    acc = jnp.zeros((TILE_H * TILE_W * p, c2), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            for dp in range(3):
                xs = jax.lax.slice(
                    xv, (dh, dw, dp, 0),
                    (dh + TILE_H, dw + TILE_W, dp + p, c2))
                m = xs.reshape(TILE_H * TILE_W * p, c2)
                acc = acc + jax.lax.dot(
                    m, w_ref[dh, dw, dp].astype(m.dtype),
                    preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.reshape(TILE_H, TILE_W, p, c2).astype(o_ref.dtype)

@jax.jit
def pallas_conv(x, w):
    h, wd, d, c = x.shape
    xf = x.reshape(h, wd, d // 2, 2 * c)
    xf = jnp.pad(xf, ((1, 1), (1, 1), (1, 1), (0, 0)))
    p = d // 2
    nh, nw = h // TILE_H, wd // TILE_W
    # materialise halo tiles: (nh, nw, TH+2, TW+2, P+2, 2C)
    rows = jnp.stack([jax.lax.slice_in_dim(xf, i * TILE_H, i * TILE_H + TILE_H + 2, axis=0)
                      for i in range(nh)])
    tiles = jnp.stack([jax.lax.slice_in_dim(rows, j * TILE_W, j * TILE_W + TILE_W + 2, axis=2)
                       for j in range(nw)], axis=1)
    out = pl.pallas_call(
        kernel,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_H + 2, TILE_W + 2, p + 2, 2 * c),
                         lambda i, j: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 3, 2 * c, 2 * c),
                         lambda i, j: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE_H, TILE_W, p, 2 * c),
                               lambda i, j: (i, j, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nh, nw, TILE_H, TILE_W, p, 2 * c),
                                       x.dtype),
    )(tiles, w)
    # (nh, nw, TH, TW, P, 2C) -> (H, W, D, C)
    out = out.transpose(0, 2, 1, 3, 4, 5).reshape(h, wd, p, 2 * c)
    return out.reshape(h, wd, d, c)

rng = np.random.default_rng(0)
C, H, W, D = 64, 128, 128, 64
x = jnp.asarray(rng.standard_normal((H, W, D, C)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.03, jnp.bfloat16)
w = jnp.asarray(build_w(k), jnp.bfloat16)

ref = jax.lax.conv_general_dilated(x[None], k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'))[0]
got = pallas_conv(x, w)
print("max diff:",
      float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))),
      flush=True)

f10 = jax.jit(lambda x, w: jnp.sum(jax.lax.fori_loop(
    0, 10, lambda i, y: pallas_conv(y, w), x).astype(jnp.float32)))
def t2(f, *a, n=3):
    float(f(*a)); ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(f(*a)); ts.append(time.perf_counter() - t0)
    return min(ts) * 1000
ms = t2(f10, x, w)
fl = 10 * 2 * 27 * C * C * H * W * D
print(f"10x pallas conv: {ms:.1f} ms ({fl/ms/1e9:.0f} TFLOP/s-equivalent vs 30 XLA)",
      flush=True)
