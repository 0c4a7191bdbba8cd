"""Aggregate per-op device time from an existing xplane trace dir.

Groups the 'XLA Ops' line by op-name family (prefix before the first '.'),
prints top families and top individual ops, normalised per run.

    python experiments/report_ops.py <trace_dir> [runs] [top]
"""

import glob
import os
import sys
from collections import defaultdict


def main():
    outdir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    fam = defaultdict(float)
    ops = defaultdict(float)
    total = 0.0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    d = ev.duration_ps / 1e9 / runs
                    total += d
                    base = name.split(" ")[0].lstrip("%")
                    ops[base] += d
                    fam[base.split(".")[0]] += d
    print(f"total device op time: {total:.2f} ms/run over {runs} runs")
    print("\n-- top families --")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:8.3f} ms  {k}")
    print("\n-- top individual ops --")
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:8.3f} ms  {k}")


if __name__ == "__main__":
    main()
