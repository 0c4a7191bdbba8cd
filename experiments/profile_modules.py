"""Module-level device timeline: per-executable spans and inter-module gaps.

Traces N back-to-back volume runs (the bench's pipelined basis) and prints
every device event on the "XLA Modules" line — executable name, start,
duration — plus the gaps between consecutive module executions. This is the
reliable way to see whether the ~40 ms/volume of wall-vs-device slack is
device idle between programs, device idle inside the program, or device
work the op-level trace misses.

    python experiments/profile_modules.py [--runs 2]
"""

import argparse
import glob
import os
import sys
import tempfile

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
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    init_patch = jnp.zeros((1,) + roi + (1,), jnp.bfloat16)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), init_patch, train=False))()["params"]
    params = prepack_params(model, params, init_patch)
    forward = make_eval_forward(model)
    runner = SlidingWindowRunner(
        lambda x, p: forward(p, x), roi, 1, overlap=0.6,
        mode="constant", depth_bucket=roi[2], chunk_bucket=1,
        derive_background=forward.fg_only)
    volume = jnp.asarray(
        rng.standard_normal((1, 512, 512, 144, 1)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def run_synced():
        out = runner(volume, params)
        return float(jnp.sum(out[0, 0, 0, 0]))

    import time

    run_synced()
    run_synced()
    t0 = time.perf_counter()
    outs = [runner(volume, params) for _ in range(runs)]
    sums = [jnp.sum(out[0, 0, 0, 0]) for out in outs]
    acc = sum(float(s) for s in sums)
    wall_untraced = time.perf_counter() - t0
    with jax.profiler.trace(outdir):
        t0 = time.perf_counter()
        outs = [runner(volume, params) for _ in range(runs)]
        sums = [jnp.sum(out[0, 0, 0, 0]) for out in outs]
        acc = sum(float(s) for s in sums)
        wall = time.perf_counter() - t0
    print(f"acc {acc}  wall(traced) {wall*1000/runs:.1f} ms/run  "
          f"wall(untraced) {wall_untraced*1000/runs:.1f} ms/run",
          file=sys.stderr)


def report(outdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                print(f"[{plane.name} / {line.name}] "
                      f"{len(line.events)} events")
                if "Module" not in line.name:
                    continue
                evs = sorted(
                    ((ev.offset_ps, ev.duration_ps,
                      ev_meta.get(ev.metadata_id, "?"))
                     for ev in line.events), key=lambda t: t[0])
                prev_end = None
                for off, dur, name in evs:
                    gap = "" if prev_end is None else (
                        f"  gap_before={ (off - prev_end) / 1e9:8.3f} ms")
                    print(f"  t={off/1e9:10.3f} dur={dur/1e9:9.3f} ms "
                          f"{name[:70]}{gap}")
                    prev_end = off + dur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()
    outdir = args.dir
    if outdir is None:
        outdir = tempfile.mkdtemp(prefix="xp_mod_")
        capture(outdir, args.runs)
        print(f"trace dir: {outdir}", file=sys.stderr)
    report(outdir)


if __name__ == "__main__":
    main()
