"""Bisect EmbedAttention3DBlock cost by n_layers (0, 1, 2, 4, 8).

The standalone SelfAttentionLayer measures 0.5 ms, the 8-layer block 13 ms;
the marginal per-layer cost inside the block tells whether composition
(layouts/fusion) or a specific sub-op is to blame.

Run: python experiments/profile_ea_layers.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.models.blocks import EmbedAttention3DBlock

DT = jnp.bfloat16
OH, OW, D, C = 78, 46, 64, 32
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


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    crop = jnp.asarray(rng.standard_normal((1, OH, OW, D, C)), DT)
    for n_layers in (0, 1, 2, 4, 8):
        ea = EmbedAttention3DBlock(in_dim=C, d_model=D_MODEL, nhead=NHEAD,
                                   dropout=0.2, n_layers=n_layers, dtype=DT)
        p = jax.jit(lambda ea=ea: ea.init(jax.random.PRNGKey(0), crop,
                                          train=False))()
        t = amortised(lambda p, c, ea=ea: ea.apply(p, c, train=False),
                      p, crop)
        print(f"EmbedAttention n_layers={n_layers}: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
