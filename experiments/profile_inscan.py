"""Attribute the ~8 ms/window in-scan forward tax (round-2 weak #3).

Round-2 finding: the eval-window forward costs ~92 ms standalone but ~100 ms
inside the sliding-window scan, while blend/slice overhead with a trivial
predictor is only 0.6 ms/window — so the tax is a fusion/layout context
difference, not the blend math. This experiment isolates candidates:

  A standalone forward (baseline, amortised over windows)
  B scan over PRE-STAGED window stack (no dynamic_slice in the body)
  C scan with dynamic_slice input + trivial blend (current runner shape)
  D C + optimization_barrier fences around the predictor call
  E the actual runner end-to-end

plus batch-2 forward standalone (sw_batch diagnosis, round-2 weak #6).

Usage (axon TPU): python experiments/profile_inscan.py [--depth 144]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:1]))


def timeit(fn, *args, reps=3, label=""):
    fn(*args)  # compile+warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label:58s} {best*1000:8.1f} ms  {[f'{t*1000:.0f}' for t in times]}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=144)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from lintransunet_tpu.engine import SlidingWindowRunner, make_eval_forward
    from lintransunet_tpu.engine.sliding_window import (
        dense_window_starts, normalisation_map, padded_spatial_shape)
    from lintransunet_tpu.models import MaskTransUnet

    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)
    roi = (512, 512, 64)
    rng = np.random.default_rng(0)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + roi + (1,), jnp.bfloat16), train=False))()["params"]
    forward = make_eval_forward(model)

    vol_shape = (1, 512, 512, args.depth, 1)
    volume = jnp.asarray(rng.standard_normal(vol_shape), np.float32
                         ).astype(jnp.bfloat16)
    spatial = padded_spatial_shape(vol_shape[1:4], roi)
    starts = dense_window_starts(spatial, roi, 0.6)
    n_win = starts.shape[0]
    print(f"windows: {n_win}")

    window = volume[:, :, :, :64, :]

    # A: standalone forward, amortised over the same window count
    @jax.jit
    def forward_n(p, x):
        def body(carry, _):
            out = forward(p, x + carry.astype(x.dtype))
            return jnp.max(out).astype(jnp.float32) * 0, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_win)
        return c

    timeit(lambda: sync(forward_n(params, window)),
           reps=args.reps, label=f"A standalone forward x{n_win} (scan, no slicing)")

    # B: scan over a pre-staged window stack
    wstack = jnp.stack([jax.lax.dynamic_slice(
        volume, (0, s[0], s[1], s[2], 0), (1,) + roi + (1,))
        for s in starts])

    @jax.jit
    def prestaged(p, ws):
        def body(carry, w):
            out = forward(p, w + carry.astype(w.dtype))
            return carry * 0, jnp.sum(out.astype(jnp.float32))
        _, sums = jax.lax.scan(body, jnp.bfloat16(0), ws)
        return jnp.sum(sums)

    timeit(lambda: sync(prestaged(params, wstack)),
           reps=args.reps, label="B pre-staged window stack scan")

    # C: dynamic_slice inside the body + trivial blend accumulation
    starts_j = jnp.asarray(starts)

    @jax.jit
    def sliced(p, vol):
        def body(carry, s):
            w = jax.lax.dynamic_slice(
                vol, (0, s[0], s[1], s[2], 0), (1,) + roi + (1,))
            out = forward(p, w)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), starts_j)
        return c

    timeit(lambda: sync(sliced(params, volume)),
           reps=args.reps, label="C dynamic_slice in body + scalar accum")

    # D: same as C with barriers fencing the forward
    @jax.jit
    def fenced(p, vol):
        def body(carry, s):
            w = jax.lax.dynamic_slice(
                vol, (0, s[0], s[1], s[2], 0), (1,) + roi + (1,))
            w = jax.lax.optimization_barrier(w)
            out = forward(p, w)
            out = jax.lax.optimization_barrier(out)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), starts_j)
        return c

    timeit(lambda: sync(fenced(params, volume)),
           reps=args.reps, label="D C + optimization_barrier fences")

    # E: the real runner
    runner = SlidingWindowRunner(lambda x, p: forward(p, x), roi, 1,
                                 overlap=0.6, mode="constant",
                                 depth_bucket=64, chunk_bucket=1)
    timeit(lambda: sync(runner(volume, params)),
           reps=args.reps, label="E SlidingWindowRunner end-to-end")

    # sw_batch diagnosis: batch-2 forward standalone
    w2 = jnp.concatenate([window, window], axis=0)

    @jax.jit
    def forward2_n(p, x):
        def body(carry, _):
            out = forward(p, x + carry.astype(x.dtype))
            return jnp.max(out).astype(jnp.float32) * 0, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None,
                            length=max(n_win // 2, 1))
        return c

    timeit(lambda: sync(forward2_n(params, w2)),
           reps=args.reps,
           label=f"F standalone BATCH-2 forward x{max(n_win // 2, 1)}")


if __name__ == "__main__":
    main()
