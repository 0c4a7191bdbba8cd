"""Trace the FULL SlidingWindowRunner volume pass (the bench.py path) and
report device-idle gaps.

bench.py round-4 numbers: 234.8 patches/s = 80.8 ms/window WALL at the
pipelined (back-to-back dispatch, one sync) basis, while the eval-forward
trace accounts only ~73.6 ms/window of device time — a ~9% gap. This tool
decides whether that gap is device idle (host/tunnel feed stalls between
chunk dispatches → fixable by fewer/larger dispatches or donation) or
device work the forward-only trace misses (blend/stack ops).

Usage: python experiments/profile_runner_gaps.py [--runs 3]
"""

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")


def capture(outdir, runs):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lintransunet_tpu.engine import SlidingWindowRunner, make_eval_forward
    from lintransunet_tpu.models import MaskTransUnet, prepack_params

    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)
    roi = (512, 512, 64)
    vol_shape = (1, 512, 512, 144, 1)
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    init_patch = jnp.zeros((1,) + roi + (1,), jnp.bfloat16)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), init_patch, train=False))()["params"]
    params = prepack_params(model, params, init_patch)
    forward = make_eval_forward(model)
    runner = SlidingWindowRunner(
        lambda x, p: forward(p, x), roi, 1, overlap=0.6,
        mode="constant", depth_bucket=roi[2], chunk_bucket=1)
    volume = jnp.asarray(
        rng.standard_normal(vol_shape).astype(np.float32)).astype(jnp.bfloat16)

    def run_synced():
        out = runner(volume, params)
        return float(jnp.sum(out[0, 0, 0, 0]))

    run_synced()
    run_synced()
    with jax.profiler.trace(outdir):
        # the bench's pipelined basis: back-to-back dispatch, one sync
        outs = [runner(volume, params) for _ in range(runs)]
        acc = 0.0
        for out in outs:
            acc += float(jnp.sum(out[0, 0, 0, 0]))
    print("acc", acc, file=sys.stderr)


def report(outdir, runs):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name or "Async" in line.name:
                    continue
                evs = sorted(
                    ((ev.offset_ps, ev.duration_ps,
                      ev_meta.get(ev.metadata_id, "?"))
                     for ev in line.events), key=lambda t: t[0])
                if not evs:
                    continue
                span = (evs[-1][0] + evs[-1][1] - evs[0][0]) / 1e9
                busy = sum(d for _, d, _ in evs) / 1e9
                print(f"[{plane.name} / {line.name}] {len(evs)} events, "
                      f"span {span:.2f} ms, busy {busy:.2f} ms, "
                      f"idle {span - busy:.2f} ms "
                      f"({100 * (span - busy) / span:.1f}%)")
                # top idle gaps with the ops on each side
                gaps = []
                cur_end = evs[0][0] + evs[0][1]
                prev_name = evs[0][2]
                for off, dur, name in evs[1:]:
                    if off > cur_end:
                        gaps.append((off - cur_end, prev_name, name))
                    if off + dur > cur_end:
                        cur_end = off + dur
                        prev_name = name
                gaps.sort(reverse=True)
                tot = sum(g for g, _, _ in gaps)
                print(f"  {len(gaps)} gaps totalling {tot / 1e9:.2f} ms; "
                      f"top 20 (ms | after-op -> before-op):")
                agg = defaultdict(float)
                for g, a, b in gaps:
                    agg[(a.split(".")[0], b.split(".")[0])] += g
                for g, a, b in gaps[:20]:
                    print(f"  {g / 1e9:8.3f}  {a[:60]} -> {b[:60]}")
                print("  -- gap totals by (after -> before) op family --")
                for (a, b), g in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
                    print(f"  {g / 1e9:8.3f}  {a} -> {b}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()
    outdir = args.dir
    if outdir is None:
        outdir = tempfile.mkdtemp(prefix="xp_runner_")
        capture(outdir, args.runs)
        print(f"trace dir: {outdir}", file=sys.stderr)
    report(outdir, args.runs)


if __name__ == "__main__":
    main()
