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
import json
import re
import sys


def _varint(buf: bytes, i: int):
    r = s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def decode_memory_breakdown(raw: bytes):
    """Hand-decode OpMetrics.MemoryAccessBreakdown (the proto isn't shipped
    with this TF build): repeated submessages of varint fields
    {1: operation_type (1=read, 2=write), 2: memory_space, 3: bytes}.

    Memory-space ids observed against HLO layouts (see docs/PERF.md):
    1 = HBM (default space), 3 = VMEM (tensors annotated S(1) — XLA's
    alternate-memory pass pins them on-chip)."""
    out = []
    i = 0
    while i < len(raw):
        _tag, i = _varint(raw, i)
        ln, i = _varint(raw, i)
        sub, i = raw[i:i + ln], i + ln
        j, rec = 0, {}
        while j < len(sub):
            t, j = _varint(sub, j)
            v, j = _varint(sub, j)
            rec[t >> 3] = v
        out.append((rec.get(1, 0), rec.get(2, 0), rec.get(3, 0)))
    return out


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
        smd = plane.stat_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            buckets: collections.Counter = collections.Counter()
            per_op: collections.Counter = collections.Counter()
            counts: collections.Counter = collections.Counter()
            # per-op-occurrence stats (bytes/flops are static per op, so
            # keep one sample per distinct op, not a sum over occurrences)
            op_stats: dict = {}
            stat_names: collections.Counter = collections.Counter()
            for ev in line.events:
                name = md[ev.metadata_id].name
                if name.startswith("%while"):
                    continue  # wrapper double-counts its children
                m = re.match(r"%([a-zA-Z\-_]+?)[.\d]*\s*=", name)
                buckets[m.group(1) if m else "?"] += ev.duration_ps
                per_op[name] += ev.duration_ps
                counts[name] += 1
                sts = {}
                for prefix, stats in (("", ev.stats),
                                      ("md:", md[ev.metadata_id].stats)):
                    # metadata-level stats carry XLA's static cost-analysis
                    # numbers; event-level stats carry per-occurrence ones
                    for st in stats:
                        sname = prefix + smd[st.metadata_id].name
                        stat_names[sname] += 1
                        if sname == "md:memory_access_breakdown":
                            for ot, sp, by in decode_memory_breakdown(
                                    st.bytes_value):
                                rw = {1: "read", 2: "write"}.get(ot, ot)
                                sts[f"bytes_space{sp}_{rw}"] = \
                                    sts.get(f"bytes_space{sp}_{rw}", 0) + by
                        else:
                            sts[sname] = (st.int64_value or st.uint64_value
                                          or st.double_value)
                op_stats[name] = sts
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
            print("\navailable stat fields (occurrences):")
            for sname, n in stat_names.most_common(30):
                print(f"  x{n:<7} {sname}")
            # aggregate any bytes/flops-shaped stats across distinct ops,
            # weighted by per-step occurrence count (counts[name] / steps)
            agg: collections.Counter = collections.Counter()
            for name, sts in op_stats.items():
                per_step = counts[name] / steps
                for sname, val in sts.items():
                    if re.search(r"bytes|flops", sname, re.I):
                        agg[sname] += val * per_step
            if agg:
                print("\nper-step totals of bytes/flops stats:")
                for sname, val in agg.most_common():
                    print(f"  {val / 1e6:12.2f} M  {sname}")
            summary = {
                "per_step_ms": {k: v / 1e9 / steps
                                for k, v in buckets.most_common()},
                "per_step_stat_totals": dict(agg),
                "steps": steps,
            }
            with open(f"{trace_dir}/parsed_summary.json", "w") as f:
                json.dump(summary, f, indent=2)
            print(f"\nwrote {trace_dir}/parsed_summary.json")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/satae_trace",
         int(sys.argv[2]) if len(sys.argv) > 2 else 60)
