"""Aggregate an xplane trace (jax.profiler) into a top-HLO-ops table.

Standalone replacement for the tensorboard_plugin_profile hlo_stats
converter, which is broken in this image (protobuf 5.x vs the plugin's
generated 3.x descriptors; the TF pywrap converter lacks
xspace_to_tools_data). Parses the XSpace proto directly via
tensorflow.tsl.profiler.protobuf.xplane_pb2 and sums self-times on the
device "XLA Ops" line.

Usage: python scripts/xplane_top_ops.py [trace.xplane.pb] [--steps 5]
       [--top 50] [--merge-prefix]
"""

from __future__ import annotations

import argparse
import collections
import glob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("xplane", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=5,
                    help="trace step count (durations divided by this)")
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--min-ms", type=float, default=0.0)
    args = ap.parse_args()

    xp = args.xplane or sorted(glob.glob(
        "/tmp/medmoe_profile/**/*.xplane.pb", recursive=True))[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xp, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if ":TPU" not in plane.name:
            continue
        by_op = collections.Counter()
        occ = collections.Counter()
        for line in plane.lines:
            # the synchronous device timeline only — "Async XLA Ops" spans
            # cover the whole start→done window of overlapped DMAs and
            # would massively overcount
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                by_op[name] += ev.duration_ps / 1e9   # ps → ms
                occ[name] += 1
        if not by_op:
            continue
        total = sum(by_op.values()) / args.steps
        print(f"# plane: {plane.name} — {total:.2f} ms/step attributed "
              f"({len(by_op)} distinct ops)")
        print(f"{'ms/step':>9}  {'%':>5}  {'n':>5}  op")
        for name, ms in by_op.most_common(args.top):
            per_step = ms / args.steps
            if per_step < args.min_ms:
                break
            print(f"{per_step:9.3f}  {100 * per_step / total:5.1f}  "
                  f"{occ[name] // args.steps:5d}  {name[:140]}")


if __name__ == "__main__":
    main()
