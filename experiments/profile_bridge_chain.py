"""Find the missing ~7 ms in ROIBridge L1: parts sum to ~6.6 ms, whole is ~14.

Times three variants of the bridge chain:
  A. full ROIBridge (mask -> bbox -> dynamic warp -> attention -> warp back)
  B. same chain but with a STATIC box (no mask_boundary, weights constant)
  C. chain without the warps (embed+attention+unembed on a static crop)
  D. mask_boundary + weight construction alone

Run: python experiments/profile_bridge_chain.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu import ops
from lintransunet_tpu.models.blocks import EmbedAttention3DBlock
from lintransunet_tpu.models.bridges import ROIBridge

DT = jnp.bfloat16
H, W, D, C = 128, 128, 64, 32
OH, OW = 78, 46
D_MODEL, NHEAD = 128, 4


def amortised(stage, params, *args, reps=6):
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
    x = jnp.asarray(rng.standard_normal((1, H, W, D, C)), DT)
    mask = jnp.asarray(rng.uniform(0, 1, (1, H, W, D, 1)), DT)

    rb = ROIBridge(in_dim=C, d_model=D_MODEL, nhead=NHEAD, n_layers=8,
                   roi_size=65, dtype=DT)
    p_rb = jax.jit(lambda: rb.init(jax.random.PRNGKey(0), x, mask,
                                   train=False))()
    show("A. FULL ROIBridge L1",
         amortised(lambda p, x, m: rb.apply(p, x, m, train=False),
                   p_rb, x, mask))

    # B. static box, same EmbedAttention params as inside the bridge
    ea = EmbedAttention3DBlock(in_dim=C, d_model=D_MODEL, nhead=NHEAD,
                               dropout=0.2, n_layers=8, dtype=DT)
    crop0 = jnp.zeros((1, OH, OW, D, C), DT)
    p_ea = jax.jit(lambda: ea.init(jax.random.PRNGKey(0), crop0,
                                   train=False))()
    x0 = jnp.asarray([20.0]); x1 = jnp.asarray([90.0])
    y0 = jnp.asarray([30.0]); y1 = jnp.asarray([80.0])

    def chain_static(p, x):
        gx = ops.transfer_index(x0, x1, H - 1, 65, OH)
        gy = ops.transfer_index(y0, y1, W - 1, 39, OW)
        roi = ops.separable_grid_sample_2d(
            x, ops.bilinear_weights(gx, H), ops.bilinear_weights(gy, W))
        roi = ea.apply(p, roi, train=False)
        bx = ops.transfer_back_index(x0, x1, H - 1, 65, OH)
        by = ops.transfer_back_index(y0, y1, W - 1, 39, OW)
        return ops.separable_grid_sample_2d(
            roi, ops.bilinear_weights(bx, roi.shape[1]),
            ops.bilinear_weights(by, roi.shape[2]))
    show("B. static-box warp + EmbedAttention + warp back",
         amortised(chain_static, p_ea, x))

    # C. EmbedAttention alone on a static crop
    crop = jnp.asarray(rng.standard_normal((1, OH, OW, D, C)), DT)
    show("C. EmbedAttention8 on (78,46,64,32)",
         amortised(lambda p, c: ea.apply(p, c, train=False), p_ea, crop))

    # D. bbox + weights alone
    def boxes(_, m):
        binary = m[..., 0] >= 0.5
        box = ops.mask_boundary(binary, 39, 23)
        gx = ops.transfer_index(box[:, 0], box[:, 3], H - 1, 65, OH)
        gy = ops.transfer_index(box[:, 1], box[:, 4], W - 1, 39, OW)
        return ops.bilinear_weights(gx, H), ops.bilinear_weights(gy, W)
    show("D. mask_boundary + fisheye weights",
         amortised(boxes, None, mask))


if __name__ == "__main__":
    main()
