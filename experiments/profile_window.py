"""Profile the 512x512x64 eval-window forward: stage-level timings on TPU.

Isolates (a) the jitted model forward (logits path, apply_softmax=False /
one-hot), (b) the one-hot-argmax epilogue alone, (c) the full sliding-window
runner step, to find where the ~105 ms goes. Timings follow the axon rules:
scalar host transfer as the only reliable barrier, amortised over a
fori_loop where possible.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.engine import SlidingWindowRunner, make_eval_forward
from lintransunet_tpu.models import MaskTransUnet
from lintransunet_tpu.models.registry import one_hot_argmax

ROI = (512, 512, 64)


def timeit(fn, *args, reps=6):
    fn(*args)  # compile+warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1,) + ROI + (1,)).astype(np.float32),
                    jnp.bfloat16)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + ROI + (1,), jnp.bfloat16),
        train=False))()["params"]

    # (a) full eval forward (one-hot argmax branch, what the runner calls)
    fwd = jax.jit(lambda p, v: jnp.sum(model.apply(
        {"params": p}, v, train=False)[0, 0, 0]))
    t = timeit(lambda: float(fwd(params, x)))
    print(f"eval forward (one-hot branch): {t*1e3:.1f} ms")

    # (b) logits only (no argmax/one-hot epilogue)
    fwd_logits = jax.jit(lambda p, v: jnp.sum(model.apply(
        {"params": p}, v, train=False, return_aux=True)[0][0, 0, 0]))
    t = timeit(lambda: float(fwd_logits(params, x)))
    print(f"train-branch fwd incl f32 softmax+masks: {t*1e3:.1f} ms")

    # (c) one_hot_argmax alone on a full-res f32 tensor
    logits = jnp.asarray(rng.standard_normal((1,) + ROI + (2,)), jnp.float32)
    ep = jax.jit(lambda l: jnp.sum(one_hot_argmax(l)[0, 0, 0]))
    t = timeit(lambda: float(ep(logits)))
    print(f"one_hot_argmax alone (512x512x64x2 f32): {t*1e3:.1f} ms")

    # (d) the full runner on a 144-deep volume (the bench workload)
    forward = make_eval_forward(model)
    runner = SlidingWindowRunner(lambda v, p: forward(p, v), ROI, 1,
                                 overlap=0.6, mode="constant",
                                 depth_bucket=64)
    vol = jnp.asarray(rng.standard_normal((1, 512, 512, 144, 1))
                      .astype(np.float32), jnp.bfloat16)
    t = timeit(lambda: float(jnp.sum(runner(vol, params)[0, 0, 0, 0])))
    n_real = runner._grids[(1, 512, 512, 144, 1)][1].sum()
    print(f"runner 144-deep volume: {t*1e3:.1f} ms "
          f"({float(n_real):.0f} real windows)")


if __name__ == "__main__":
    main()
