"""Aggregate a jax.profiler xplane trace into per-op device-time tables.

Usage:
    python benchmarks/profile_step.py            # writes /tmp/satae_trace
    python benchmarks/parse_xplane.py /tmp/satae_trace [steps]

Prints, for the TPU device plane: total op time per step, a bucket table by
op kind (fusion / copy / reshape / multiply_reduce_fusion / ...), and the
top individual ops. ``steps`` (default 60 = profile_step's 3 dispatches x
K=20) divides totals into per-step costs.

This is the tool that found the round-4 adjoint-VJP win: the step's layout
copies (space-to-depth transposes from autodiff-through-depth-to-space)
showed up as ~1.2 ms/step of pure data movement (docs/PERF.md). The xplane
proto ships with the installed tensorflow (tsl.profiler.protobuf); no
tensorboard UI needed.
"""

from __future__ import annotations

import collections
import glob
import re
import sys


def main(trace_dir: str, steps: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2 as xpb

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xpb.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            buckets: collections.Counter = collections.Counter()
            per_op: collections.Counter = collections.Counter()
            counts: collections.Counter = collections.Counter()
            for ev in line.events:
                name = md[ev.metadata_id].name
                if name.startswith("%while"):
                    continue  # wrapper double-counts its children
                m = re.match(r"%([a-zA-Z\-_]+?)[.\d]*\s*=", name)
                buckets[m.group(1) if m else "?"] += ev.duration_ps
                per_op[name] += ev.duration_ps
                counts[name] += 1
            tot = sum(buckets.values())
            print(f"\n{plane.name}: total XLA-op time "
                  f"{tot / 1e9:.2f} ms = {tot / 1e9 / steps:.3f} ms/step "
                  f"(/{steps} steps)")
            print("\nby op kind (ms/step):")
            for kind, ps in buckets.most_common(15):
                print(f"  {ps / 1e9 / steps:7.3f}  {kind}")
            print("\ntop ops (ms/step):")
            for name, ps in per_op.most_common(20):
                print(f"  {ps / 1e9 / steps:7.3f}  x{counts[name]:<4} "
                      f"{name[:100]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/satae_trace",
         int(sys.argv[2]) if len(sys.argv) > 2 else 60)
