"""Fused transformer-stack kernel vs the flax SelfAttentionLayer chain.

Round-3 check: the fused Pallas stack (ops/pallas_layer.py) landed without a
standalone TPU measurement and the first full-bench run after it regressed
(164.6 vs ~180 patches/s, contaminated by CPU contention). This times both
paths on the model's real bridge token shapes, amortised marginal (axon
rules), plus numerics diffs.

Shapes (flagship 512x512x64 window):
  L1 ROIBridge:   (1, 28704, 128)  nhead 4   (39x23x32 embedded ROI)
  L2 ROIBridge:   (1, 10752, 256)  nhead 8
  bottleneck:     (1,  1024, 256)  nhead 8

Run: python experiments/profile_fused_stack.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16


def amortised(fn, *args, reps=6):
    def make(n):
        @jax.jit
        def looped(*a):
            def body(_, acc):
                pert = jax.tree.map(
                    lambda x: x + (0 * acc).astype(x.dtype), a)
                out = fn(*pert)
                return jnp.sum(out[0, 0]).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return looped

    lo, hi = make(reps), make(3 * reps)

    def best(f):
        float(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(hi) - best(lo)) / (2 * reps) * 1e3


def main():
    import flax.linen as nn

    from lintransunet_tpu.models.blocks import SelfAttentionLayer
    from lintransunet_tpu.ops import pallas_layer as pll

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)

    for name, (n_tok, c, nhead, n_layers) in {
        "L1 ROI (28704, 128) x7": (28704, 128, 4, 7),
        "L2 ROI (10752, 256) x7": (10752, 256, 8, 7),
        "bottleneck (1024, 256) x7": (1024, 256, 8, 7),
        "single layer (28704, 128)": (28704, 128, 4, 1),
    }.items():

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                for i in range(n_layers):
                    x = SelfAttentionLayer(c, nhead, 2 * c, 0.2, dtype=DT,
                                           name=f"layers_{i}")(x, None,
                                                               train=train)
                return x

        x = jnp.asarray(rng.standard_normal((1, n_tok, c)), DT)
        mod = Stack()
        params = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), x)
                         )()["params"]

        flax_fn = jax.jit(lambda p, x: mod.apply({"params": p}, x))
        t_flax = amortised(lambda p, x: flax_fn(p, x), params, x)

        a, w2, vecs = jax.jit(lambda p: pll.stack_layer_params(
            [p[f"layers_{i}"] for i in range(n_layers)]))(params)
        fused_fn = jax.jit(lambda x, a, w2, vecs:
                           pll.fused_transformer_stack(x, a, w2, vecs, nhead))
        t_fused = amortised(fused_fn, x, a, w2, vecs)

        yf = flax_fn(params, x).astype(jnp.float32)
        yk = fused_fn(x, a, w2, vecs).astype(jnp.float32)
        diff = float(jnp.max(jnp.abs(yf - yk)))
        scale = float(jnp.max(jnp.abs(yf)))

        print(f"{name:28s} flax {t_flax:7.3f} ms   fused {t_fused:7.3f} ms  "
              f"({t_flax / t_fused:4.2f}x)   maxdiff {diff:.4f} "
              f"(scale {scale:.2f})", flush=True)


if __name__ == "__main__":
    main()
