"""Micro-profile of ROIBridge L1 internals (the 18 ms bridge).

Geometry: skip (1, 128, 128, 64, 32), roi 65 -> crop (78, 46, 64),
embed d_model=128 -> tokens 39*23*32 = 28704, 8 attention layers.

Each stage timed amortised inside one fori_loop program (axon dispatch is
~30 ms, so per-call timing is useless).

Run: python experiments/profile_bridge.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu import ops
from lintransunet_tpu.models.blocks import (
    ConvPosEmbed3d, DownEmbedBlock, SelfAttentionLayer, UpEmbedBlock)
from lintransunet_tpu.ops.pallas_attention import linear_attention_pallas

DT = jnp.bfloat16
REPS = 10


def amortised(stage, params, *args, reps=REPS):
    """Marginal per-iteration cost: (T(3*reps) - T(reps)) / (2*reps).

    Cancels the ~30 ms axon dispatch floor that a single-rep-count
    measurement folds into every stage.
    """

    def make(n):
        def looped(p, *a):
            def body(_, acc):
                perturbed = tuple(x + (0 * acc).astype(x.dtype) for x in a)
                out = stage(p, *perturbed)
                return sum(jnp.sum(l).astype(jnp.float32)
                           for l in jax.tree_util.tree_leaves(out))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return jax.jit(looped)

    lo, hi = make(reps), make(3 * reps)

    def best(f):
        float(f(params, *args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(params, *args))
            times.append(time.perf_counter() - t0)
        return min(times)

    return (best(hi) - best(lo)) / (2 * reps) * 1e3


def show(name, t):
    print(f"{name:<52s} {t:8.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    H, W, D, C = 128, 128, 64, 32
    OH, OW = 78, 46   # eval roi sizes for roi_size=65
    D_MODEL, NHEAD = 128, 4
    x = jnp.asarray(rng.standard_normal((1, H, W, D, C)), DT)

    # 1. forward warp (two dot_generals)
    x0 = jnp.asarray([20.0]); x1 = jnp.asarray([90.0])
    y0 = jnp.asarray([30.0]); y1 = jnp.asarray([80.0])

    def warp_fwd(_, x):
        gx = ops.transfer_index(x0, x1, H - 1, 65, OH)
        gy = ops.transfer_index(y0, y1, W - 1, 39, OW)
        return ops.separable_grid_sample_2d(
            x, ops.bilinear_weights(gx, H), ops.bilinear_weights(gy, W))
    show("forward warp (128,128,64,32)->(78,46,64,32)",
         amortised(warp_fwd, None, x))

    crop = jnp.asarray(rng.standard_normal((1, OH, OW, D, C)), DT)

    # 2. inverse warp
    def warp_back(_, crop):
        bx = ops.transfer_back_index(x0, x1, H - 1, 65, OH)
        by = ops.transfer_back_index(y0, y1, W - 1, 39, OW)
        return ops.separable_grid_sample_2d(
            crop, ops.bilinear_weights(bx, OH), ops.bilinear_weights(by, OW))
    show("inverse warp (78,46,64,32)->(128,128,64,32)",
         amortised(warp_back, None, crop))

    # 3. down-embed conv (stride2 32->128)
    de = DownEmbedBlock(C, D_MODEL, down_times=1, dropout=0.2, dtype=DT)
    p_de = jax.jit(lambda: de.init(jax.random.PRNGKey(0), crop,
                                   train=False))()
    show("down embed (78,46,64,32)->(39,23,32,128)",
         amortised(lambda p, c: de.apply(p, c, train=False), p_de, crop))

    emb = jnp.asarray(rng.standard_normal((1, 39, 23, 32, D_MODEL)), DT)

    # 4. up-embed (nearest + conv 128->32)
    ue = UpEmbedBlock(C, D_MODEL, down_times=1, dropout=0.2, dtype=DT)
    p_ue = jax.jit(lambda: ue.init(jax.random.PRNGKey(0), emb,
                                   train=False))()
    show("up embed (39,23,32,128)->(78,46,64,32)",
         amortised(lambda p, e: ue.apply(p, e, train=False), p_ue, emb))

    # 5. one SelfAttentionLayer on 28704 tokens, d=128
    n_tok = 39 * 23 * 32
    tokens = jnp.asarray(rng.standard_normal((1, n_tok, D_MODEL)), DT)
    sal = SelfAttentionLayer(D_MODEL, NHEAD, 2 * D_MODEL, 0.2, dtype=DT)
    p_sal = jax.jit(lambda: sal.init(jax.random.PRNGKey(0), tokens,
                                     train=False))()
    show("1x SelfAttentionLayer 28704 tok d128 (x8 in bridge)",
         amortised(lambda p, t: sal.apply(p, t, train=False), p_sal, tokens))

    # 6. pallas attention op alone at the layer's shape
    q = jnp.asarray(rng.standard_normal((1, NHEAD, n_tok, 32)), DT)
    show("pallas linear attention (1,4,28704,32)",
         amortised(lambda _, q: linear_attention_pallas(q, q, q), None, q))

    # 7. XLA einsum linear attention for comparison
    show("XLA linear attention (1,4,28704,32)",
         amortised(lambda _, q: ops.linear_attention(q, q, q), None, q))

    # 8. the four Dense projections alone (memory-layout cost probe)
    wd = jnp.asarray(rng.standard_normal((D_MODEL, D_MODEL)) * 0.05, DT)

    def qkvo(_, t):
        o = t
        for _ in range(4):
            o = o @ wd
        return o
    show("4x Dense 28704x128x128 (no reshapes)",
         amortised(qkvo, None, tokens))

    # 0. whole ROIBridge for cross-checking the parts sum
    from lintransunet_tpu.models.bridges import ROIBridge
    rb = ROIBridge(in_dim=C, d_model=D_MODEL, nhead=NHEAD, n_layers=8,
                   roi_size=65, dtype=DT)
    mask = jnp.asarray(rng.uniform(0, 1, (1, H, W, D, 1)), DT)
    p_rb = jax.jit(lambda: rb.init(jax.random.PRNGKey(0), x, mask,
                                   train=False))()
    show("FULL ROIBridge L1",
         amortised(lambda p, x, m: rb.apply(p, x, m, train=False),
                   p_rb, x, mask, reps=6))

    # 9. PEG depthwise conv on the token grid
    peg = ConvPosEmbed3d(D_MODEL, 0.2, dtype=DT)
    grid = jnp.asarray(rng.standard_normal((1, 32, 39, 23, D_MODEL)), DT)
    p_peg = jax.jit(lambda: peg.init(jax.random.PRNGKey(0), grid,
                                     train=False))()
    show("PEG depthwise conv (32,39,23,128)",
         amortised(lambda p, g: peg.apply(p, g, train=False), p_peg, grid))


if __name__ == "__main__":
    main()
