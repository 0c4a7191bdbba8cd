"""Why is sw_batch>1 ~2x slower end-to-end? (VERDICT round-2, weak #1/item 6)

Separates the hypotheses by timing the STANDALONE eval forward at window
batch 1/2/4 for both reference geometries (512x512x64 eval-loop windows,
512x512x32 inference-CLI windows). If per-window forward cost grows with
batch, the regression is the model program itself (XLA tiling/memory at
batch>1), not the runner's canvas updates.

Run on the v5e chip:  python experiments/sw_batch_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lintransunet_tpu.engine import make_eval_forward
from lintransunet_tpu.models import MaskTransUnet, prepack_params


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)
    fwd = jax.jit(make_eval_forward(model))
    rng = np.random.default_rng(0)

    for depth in (64, 32):
        roi = (512, 512, depth)
        init = jnp.zeros((1,) + roi + (1,), jnp.bfloat16)
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), init, train=False))()["params"]
        params = prepack_params(model, params, init)
        for b in (1, 2, 4):
            try:
                x = jnp.asarray(rng.standard_normal((b,) + roi + (1,)),
                                jnp.bfloat16)

                def run():
                    return float(jnp.sum(fwd(params, x)[:, 0, 0, 0]))

                run()  # compile
                run()
                ts = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    run()
                    ts.append(time.perf_counter() - t0)
                best = min(ts)
                print(f"standalone roi {roi}: batch {b}: {best*1e3:7.1f} ms "
                      f"total, {best*1e3/b:7.1f} ms/window", flush=True)
            except Exception as e:  # OOM at big batches: keep probing
                print(f"standalone roi {roi}: batch {b}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # End-to-end runner at each sw_batch: if the standalone forward scales
    # flat but these don't, the regression is the runner's scan body
    # (canvas blend serialisation / fusion context), not the model program.
    from lintransunet_tpu.engine import SlidingWindowRunner
    from lintransunet_tpu.engine.sliding_window import (
        dense_window_starts, padded_spatial_shape)

    roi = (512, 512, 64)
    vol_shape = (1, 512, 512, 144, 1)
    init = jnp.zeros((1,) + roi + (1,), jnp.bfloat16)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), init, train=False))()["params"]
    params = prepack_params(model, params, init)
    volume = jnp.asarray(rng.standard_normal(vol_shape), jnp.bfloat16)
    real = padded_spatial_shape(vol_shape[1:4], roi)
    n_win = dense_window_starts(real, roi, 0.6).shape[0]
    for sw in (1, 2, 4):
        try:
            runner = SlidingWindowRunner(
                lambda x, p: fwd(p, x), roi, sw, overlap=0.6,
                mode="constant", depth_bucket=roi[2], chunk_bucket=1)

            def run_r():
                return float(jnp.sum(runner(volume, params)[0, 0, 0, 0]))

            run_r()  # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run_r()
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            print(f"runner sw_batch {sw}: {best*1e3:7.1f} ms total, "
                  f"{best*1e3/n_win:7.1f} ms/window ({n_win} windows)",
                  flush=True)
        except Exception as e:
            print(f"runner sw_batch {sw}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
