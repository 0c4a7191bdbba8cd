"""Pinpoint the layout poison that makes SALs 4x slower inside EmbedAttention.

All on 28704 tokens, d=128, 8 layers, pallas attention:
  A. tokens fed directly                                (baseline ~3 ms)
  B. tokens produced by _to_tokens_dhw of a 5D grid      (EA's entry)
  C. B + optimization_barrier after the reshape
  D. A + PEG reshape round-trip after layer 0            (EA's middle)
  E. D + optimization_barrier after the PEG round-trip
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.models.blocks import (
    ConvPosEmbed3d, SelfAttentionLayer, _to_tokens_dhw)

DT = jnp.bfloat16
HWD = (39, 23, 32)
N_TOK = 39 * 23 * 32
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


class Stack(nn.Module):
    entry: str = "direct"      # direct | tokens_dhw | tokens_dhw_barrier
    peg: str = "none"          # none | peg | peg_barrier

    @nn.compact
    def __call__(self, x, train=False):
        h, w, d = HWD
        if self.entry == "direct":
            tokens = x
        else:
            grid = x.reshape(1, h, w, d, D_MODEL)
            tokens, _ = _to_tokens_dhw(grid)
            if self.entry.endswith("barrier"):
                tokens = jax.lax.optimization_barrier(tokens)
        for i in range(8):
            tokens = SelfAttentionLayer(D_MODEL, NHEAD, 2 * D_MODEL, 0.2,
                                        dtype=DT, name=f"l{i}")(
                                            tokens, train=train)
            if i == 0 and self.peg != "none":
                if self.peg == "side":
                    # side-branch PEG: the main token buffer is never
                    # reshaped; only the (small) conv branch round-trips
                    # through the grid layout.
                    g = tokens.reshape(1, d, h, w, D_MODEL)
                    pos = nn.Conv(D_MODEL, (3, 3, 3), padding=1,
                                  feature_group_count=D_MODEL, dtype=DT,
                                  param_dtype=jnp.float32, name="peg")(g)
                    tokens = tokens + pos.reshape(1, d * h * w, D_MODEL)
                else:
                    g = tokens.reshape(1, d, h, w, D_MODEL)
                    g = ConvPosEmbed3d(D_MODEL, 0.2, dtype=DT, name="peg")(
                        g, train=train)
                    tokens = g.reshape(1, d * h * w, D_MODEL)
                    if self.peg.endswith("barrier"):
                        tokens = jax.lax.optimization_barrier(tokens)
        return tokens


def run(name, entry, peg):
    rng = np.random.default_rng(0)
    if entry == "direct":
        x = jnp.asarray(rng.standard_normal((1, N_TOK, D_MODEL)), DT)
    else:
        x = jnp.asarray(rng.standard_normal(
            (1, HWD[0], HWD[1], HWD[2], D_MODEL)), DT).reshape(1, -1)
        x = x.reshape(1, HWD[0] * HWD[1] * HWD[2] * D_MODEL)
    mod = Stack(entry=entry, peg=peg)
    p = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), x, train=False))()
    t = amortised(lambda p, x: mod.apply(p, x, train=False), p, x)
    print(f"{name:<52s} {t:8.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    run("A. direct tokens, no PEG", "direct", "none")
    run("B. tokens via _to_tokens_dhw, no PEG", "tokens_dhw", "none")
    run("C. B + optimization_barrier", "tokens_dhw_barrier", "none")
    run("D. direct tokens + PEG after layer 0", "direct", "peg")
    run("E. direct tokens + SIDE-BRANCH PEG", "direct", "side")


if __name__ == "__main__":
    main()
