"""Capture a jax.profiler device trace of the eval-window forward and print
the top ops by device self-time.

Round-3 tool: the fused transformer-stack kernel wins 1.3-2x isolated but
the FULL forward runs ~9 ms slower with it routed in — wall-clock A/Bs
exhausted the cheap hypotheses (token-order transpose, output layout
barrier, small-stack gating), so this gets per-op attribution from the
real device trace. Parses the xplane.pb directly with xprof's protobuf
(no tensorboard UI needed).

Usage: python experiments/profile_xplane.py [--fused 0|1] [--top 40]
"""

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")


def capture(outdir, fused, train=False, batch=1):
    os.environ["LINTRANSUNET_FUSED_STACK"] = str(fused)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lintransunet_tpu.engine import make_eval_forward
    from lintransunet_tpu.models import MaskTransUnet

    print("devices:", jax.devices(), file=sys.stderr)
    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)
    if train:
        return _capture_train(outdir, model)
    roi = (512, 512, 64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch,) + roi + (1,)), jnp.bfloat16)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), x, train=False))()["params"]
    # profile the SHIPPING path: serving params are prepacked (bench.py,
    # inference CLIs) — without this the trace shows ~12 ms/window of
    # in-graph kernel pack transforms that production no longer pays
    from lintransunet_tpu.models import prepack_params

    params = prepack_params(model, params, x)
    fwd = jax.jit(make_eval_forward(model))

    def run():
        return float(jnp.sum(fwd(params, x)[0, 0, 0, 0]))

    run()  # compile
    run()
    with jax.profiler.trace(outdir):
        for _ in range(3):
            run()


def _capture_train(outdir, model):
    """Trace one full training step (512x512x32 patch, deep supervision,
    AdamW) — the bench.py --train configuration."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lintransunet_tpu import engine
    from lintransunet_tpu.cli.common import get_criterion_list
    from lintransunet_tpu.engine.schedule import get_dynamic_weight
    from lintransunet_tpu.losses import binary as loss_module

    shape = (1, 512, 512, 32, 1)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    lbl = np.zeros(shape[:4], np.int32)
    lbl[:, 200:320, 220:300, 8:24] = 1
    labels = jnp.asarray(lbl)
    state = engine.create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros(shape, jnp.bfloat16),
        learning_rate=1e-4)
    criterions, _ = get_criterion_list(
        5, ["CrossEntroLoss", "DiceClassLoss"], loss_module)
    step_fn = engine.make_train_step(model, criterions)
    dyn_w = jnp.asarray(get_dynamic_weight(
        epochs=1, T=12.0, warmup_step=10,
        weight_list=(0.05, 0.05, 0.1, 0.1, 1.0),
        initial_weight=(0.1, 0.2, 0.3, 0.4, 1.0),
        final_weight=(2.0, 1.5, 1.0, 1.0, 1.0))[0], jnp.float32)

    def run(state, i):
        state, loss, _ = step_fn(state, images, labels, dyn_w,
                                 jax.random.PRNGKey(i))
        float(loss)
        return state

    print("compiling train step...", file=sys.stderr)
    state = run(state, 1)
    state = run(state, 2)
    with jax.profiler.trace(outdir):
        for i in range(3):
            state = run(state, 3 + i)


def report(outdir, top, bucket_filter=None):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    agg = defaultdict(float)
    counts = defaultdict(int)
    cats = defaultdict(float)
    total = 0.0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" != line.name:
                    continue
                print(f"[plane '{plane.name}' line '{line.name}': "
                      f"{len(line.events)} events]", file=sys.stderr)
                # The 'Async XLA Ops' line holds async WINDOWS (copy/
                # collective start..done spans) that overlap sync compute;
                # their durations are not additive cost. Bucket the whole
                # line separately — counting it into agg double-counted
                # ~200 ms/run on the train trace (round-4 fix).
                is_async = "Async" in line.name
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    if is_async or name.startswith(("%copy-start",
                                                    "%copy-done")):
                        cats["async(window, not cost)"] += ev.duration_ps / 1e9
                        continue
                    dur = ev.duration_ps / 1e9  # ms
                    agg[name] += dur
                    counts[name] += 1
                    total += dur
                    if name.startswith("%copy"):
                        cats["copy"] += dur
                    elif "transformer_stack" in name:
                        cats["fused-kernel"] += dur
                    elif name.startswith("%custom-call"):
                        # op-NAME prefix match only: the printed text also
                        # lists operands, and a fusion consuming a
                        # %custom-call operand is still a fusion (the old
                        # substring match misattributed ~4.5 ms/run of conv
                        # fusions on the round-4 eval trace)
                        cats["custom-call-other"] += dur
                    elif name.startswith(("%fusion", "%convert_reduce",
                                          "%compare_select", "%loop_")):
                        cats["fusion"] += dur
                    else:
                        cats["other"] += dur
    print(f"planes parsed from {len(paths)} file(s); "
          f"total sync device op time {total:.2f} ms (3 runs, "
          f"{total / 3:.2f}/run)")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v / 3:8.2f} ms/run")

    # Bucket by the op's OUTPUT shape leading spatial dims — localises cost
    # to a model stage (folded L0 = [64,128,128,*], folded L1 = [64,64,64,*],
    # bridge token/grid shapes, etc).
    import re

    def shape_bucket(name):
        m = re.search(r"=\s*(?:\()?\w+\[([0-9,]*)\]", name)
        if not m:
            return "(no-shape)"
        dims = m.group(1).split(",")
        if len(dims) >= 3:
            return "[" + ",".join(dims[:-1]) + ",*]"
        return "[" + ",".join(dims) + "]"

    buckets = defaultdict(float)
    bcount = defaultdict(int)
    for name, dur in agg.items():
        b = shape_bucket(name)
        buckets[b] += dur
        bcount[b] += counts[name]
    print("\n-- by output shape (ms/run) --")
    for b, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v / 3:9.3f} ms/run  x{bcount[b] // 3:<4d} {b}")

    print("\n-- top ops --")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 3:9.3f} ms/run  x{counts[name] // 3:<4d} {name[:240]}")

    print("\n-- copies (full) --")
    copies = [(n, d) for n, d in agg.items() if n.startswith("%copy")]
    for name, dur in sorted(copies, key=lambda kv: -kv[1])[:30]:
        print(f"{dur / 3:9.3f} ms/run  x{counts[name] // 3:<4d} {name[:300]}")

    if bucket_filter:
        print(f"\n-- ops in bucket {bucket_filter} (full) --")
        sel = [(n, d) for n, d in agg.items()
               if shape_bucket(n) == bucket_filter]
        for name, dur in sorted(sel, key=lambda kv: -kv[1]):
            print(f"{dur / 3:9.3f} ms/run  x{counts[name] // 3:<4d} "
                  f"{name[:400]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", type=int, default=0)
    ap.add_argument("--batch", type=int, default=1,
                    help="window batch for the eval-forward trace (the "
                         "sw_batch>1 scaling diagnosis)")
    ap.add_argument("--train", action="store_true",
                    help="trace the training step instead of the eval forward")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--dir", default=None,
                    help="parse an existing trace dir instead of capturing")
    ap.add_argument("--bucket", default=None,
                    help="print every op whose output-shape bucket matches "
                         "(e.g. '[128]') with full operand text")
    args = ap.parse_args()
    outdir = args.dir
    if outdir is None:
        tag = "train" if args.train else f"fused{args.fused}_b{args.batch}"
        outdir = tempfile.mkdtemp(prefix=f"xp_{tag}_")
        capture(outdir, args.fused, train=args.train, batch=args.batch)
        print(f"trace dir: {outdir}", file=sys.stderr)
    report(outdir, args.top, bucket_filter=args.bucket)


if __name__ == "__main__":
    main()
