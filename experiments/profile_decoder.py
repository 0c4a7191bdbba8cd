"""Time the ROIDecoder standalone (the remaining ~50 ms of the window).

Shapes = the real 512x512x64 window encoder outputs (packed_levels=2).
Amortised marginal timing. Optional LINTRANSUNET_DECODER_ONLY_CONVS=1 runs
a variant with the ROI bridges disabled (is_roi all False) to split conv
time from bridge time inside the decoder context.

Run: python experiments/profile_decoder.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.models.unet import ROIDecoder

DT = jnp.bfloat16


def marginal(fn, params, *args, reps=4):
    def make(n):
        @jax.jit
        def looped(params, *a):
            def body(_, acc):
                pert = tuple(x + (0 * acc).astype(x.dtype) for x in a)
                out = fn(params, *pert)
                return acc + sum(jnp.sum(l).astype(jnp.float32)
                                 for l in jax.tree_util.tree_leaves(out))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return looped

    lo, hi = make(reps), make(3 * reps)

    def best(f):
        float(f(params, *args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(params, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(hi) - best(lo)) / (2 * reps) * 1e3


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    bottle = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 256)), DT)
    skips = [jnp.asarray(rng.standard_normal(s), DT) for s in
             [(1, 128, 128, 64, 64), (1, 64, 64, 64, 128),
              (1, 64, 64, 32, 64), (1, 32, 32, 32, 128)]]

    no_roi = os.environ.get("LINTRANSUNET_DECODER_ONLY_CONVS") == "1"
    is_roi = (False,) * 5 if no_roi else (False, True, True, True, True)
    dec = ROIDecoder(
        num_layers=(16, 32, 64, 128, 256), roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=is_roi, dim_output=2, packed_levels=2,
        apply_softmax=False, return_packed_logits=True, dtype=DT)
    p = jax.jit(lambda: dec.init(jax.random.PRNGKey(0), bottle, skips,
                                 train=False))()
    t = marginal(lambda p, b, *s: dec.apply(p, b, list(s), train=False),
                 p, bottle, *skips)
    label = "ROIDecoder NO bridges (convs only)" if no_roi else "ROIDecoder full"
    print(f"{label}: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
