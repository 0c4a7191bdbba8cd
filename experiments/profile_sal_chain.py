"""Why is a SelfAttentionLayer 1.4 ms inside a chain but 0.5 ms standalone?

Variants on (1, 28704, 128) tokens:
  A. 8 chained SelfAttentionLayers (pallas attention)
  B. 8 chained SelfAttentionLayers (XLA einsum attention)
  C. 1 standalone layer (pallas)  [reference point]
  D. 8 chained layers, pallas, nhead=1 (layout probe)

Run: LINTRANSUNET_USE_PALLAS unset -> pallas on axon.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
N_TOK, D_MODEL, NHEAD = 28704, 128, 4


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


def run(name, use_pallas, n_layers, nhead):
    os.environ["LINTRANSUNET_USE_PALLAS"] = "1" if use_pallas else "0"
    from lintransunet_tpu.models.blocks import SelfAttentionLayer
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for i in range(n_layers):
                x = SelfAttentionLayer(D_MODEL, nhead, 2 * D_MODEL, 0.2,
                                       dtype=DT, name=f"l{i}")(x, train=train)
            return x

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((1, N_TOK, D_MODEL)), DT)
    mod = Stack()
    p = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), tokens,
                                 train=False))()
    t = amortised(lambda p, x: mod.apply(p, x, train=False), p, tokens)
    print(f"{name:<48s} {t:8.2f} ms  ({t / n_layers:.3f} ms/layer)",
          flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    run("A. 8x chained SAL, pallas, nhead=4", True, 8, NHEAD)
    run("B. 8x chained SAL, XLA einsum, nhead=4", False, 8, NHEAD)
    run("C. 1x SAL, pallas, nhead=4", True, 1, NHEAD)
    run("D. 8x chained SAL, pallas, nhead=1", True, 8, 1)


if __name__ == "__main__":
    main()
