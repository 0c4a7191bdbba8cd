"""Stage-level TPU profile of the 512x512x64 eval window forward (v2).

The axon tunnel adds ~30 ms of fixed dispatch/sync overhead per host
round-trip, so every stage is timed AMORTISED: the jitted function runs the
stage REPS times inside a lax.fori_loop with a serialising data dependency
(input perturbed by the carry) so XLA can neither hoist the stage out of the
loop nor overlap iterations; one scalar transfer closes the measurement.

Run: python experiments/profile_stages.py   (from the repo root, on TPU)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.engine import SlidingWindowRunner, make_eval_forward
from lintransunet_tpu.models import MaskTransUnet
from lintransunet_tpu.models.registry import one_hot_argmax
from lintransunet_tpu.models.unet import Encoder
from lintransunet_tpu.models.bridges import ConnectBridge, ROIBridge

ROI = (512, 512, 64)
DT = jnp.bfloat16
LAYERS = (16, 32, 64, 128, 256)
REPS = 8


def amortised(stage, params, *args):
    """Time one stage: REPS serialised applications inside one program."""

    def looped(p, *a):
        def body(_, acc):
            perturbed = tuple(x + (0 * acc).astype(x.dtype) for x in a)
            out = stage(p, *perturbed)
            return sum(jnp.sum(l).astype(jnp.float32)
                       for l in jax.tree_util.tree_leaves(out))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    f = jax.jit(looped)
    float(f(params, *args))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(params, *args))
        times.append(time.perf_counter() - t0)
    return min(times) / REPS * 1e3


def bench_module(name, mod, *shapes, has_mask=False):
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.standard_normal(s), DT) for s in shapes]
    params = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), *args,
                                      train=False))()
    t = amortised(lambda p, *a: mod.apply(p, *a, train=False), params, *args)
    print(f"{name:<46s} {t:8.2f} ms", flush=True)
    return t


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)

    enc = Encoder(num_layers=LAYERS, dim_input=1, packed_levels=2, dtype=DT)
    bench_module("encoder packed_levels=2 (512,512,64)", enc,
                 (1,) + ROI + (1,))

    cb = ConnectBridge(d_model=256, nhead=8, dropout=0.2, n_layers=8, dtype=DT)
    bench_module("connect bridge 4096 tok d256 x8", cb, (1, 16, 16, 16, 256))

    for name, (in_dim, d_model, nhead, roi_sz, shape) in {
        "ROIBridge L3 (32,32,32,128) roi25":
            (128, 256, 8, 25, (1, 32, 32, 32, 128)),
        "ROIBridge L2 (64,64,32,64) roi40":
            (64, 256, 8, 40, (1, 64, 64, 32, 64)),
        "ROIBridge L1 (128,128,64,32) roi65":
            (32, 128, 4, 65, (1, 128, 128, 64, 32)),
    }.items():
        mod = ROIBridge(in_dim=in_dim, d_model=d_model, nhead=nhead,
                        n_layers=8, roi_size=roi_sz, dtype=DT)
        x = jnp.asarray(rng.standard_normal(shape), DT)
        mask = jnp.asarray(rng.uniform(0, 1, shape[:-1] + (1,)), DT)
        params = jax.jit(lambda m=mod, x=x, mk=mask: m.init(
            jax.random.PRNGKey(0), x, mk, train=False))()
        t = amortised(lambda p, x, m, md=mod: md.apply(p, x, m, train=False),
                      params, x, mask)
        print(f"{name:<46s} {t:8.2f} ms", flush=True)

    logits = jnp.asarray(rng.standard_normal((1,) + ROI + (2,)), jnp.float32)
    t = amortised(lambda p, l: one_hot_argmax(l), None, logits)
    print(f"{'one_hot_argmax (512,512,64,2) f32':<46s} {t:8.2f} ms",
          flush=True)

    model = MaskTransUnet(
        num_layers=LAYERS, roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=DT)
    x = jnp.asarray(rng.standard_normal((1,) + ROI + (1,)), DT)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + ROI + (1,), DT),
        train=False))()["params"]
    t = amortised(lambda p, v: model.apply({"params": p}, v, train=False),
                  params, x)
    print(f"{'FULL eval forward (one-hot branch)':<46s} {t:8.2f} ms",
          flush=True)

    # runner: a single dispatch already; report per-window with overhead noted
    forward = make_eval_forward(model)
    runner = SlidingWindowRunner(lambda v, p: forward(p, v), ROI, 1,
                                 overlap=0.6, mode="constant",
                                 depth_bucket=64, chunk_bucket=1)
    vol = jnp.asarray(rng.standard_normal((1, 512, 512, 144, 1)), DT)
    def run():
        return float(jnp.sum(runner(vol, params)[0, 0, 0, 0]))
    run()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = min(times) * 1e3
    print(f"{'runner 144-deep vol (5 windows, 1 dispatch)':<46s} {t:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
