"""Xplane trace analysis: per-op-kind device-time rollups.

The tracing half of the observability story (reference analogue:
opencood/tools/performance_runner.py:40-59 wall-clock only — the
reference has no kernel-level profiler integration; here the xplane
protobuf that `jax.profiler.trace` / ``--trace_dir`` captures is parsed
into an actionable per-op breakdown, the workflow every round of this
framework's own perf work ran by hand).

Usage:
  # 1. capture (e.g. via the performance runner)
  python -m hmvit_tpu.tools.performance --model_dir d --synthetic \
      --trace_dir /tmp/trace
  # 2. analyze
  python -m hmvit_tpu.tools.profile /tmp/trace [--top 30] [--frames N]

``--frames`` divides totals by the number of profiled steps so numbers
read as ms/frame.
"""
from __future__ import annotations

import argparse
import collections
import glob


def load_xplane(trace_dir: str):
    """Parse the first .xplane.pb under ``trace_dir`` (recursive)."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # pragma: no cover - env without tf proto
        raise SystemExit(
            "xplane parsing needs the tensorflow profiler protos "
            "(tensorflow.tsl.profiler.protobuf.xplane_pb2)")
    paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_totals(xspace, line_name: str = "XLA Ops"):
    """{op_name: (total_ps, count)} summed over device planes."""
    agg = collections.Counter()
    cnt = collections.Counter()
    for plane in xspace.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != line_name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name] += ev.duration_ps
                cnt[name] += 1
    return agg, cnt


def op_kind(name: str) -> str:
    """Coarse kind: 'fusion', 'copy', a custom-call target, etc."""
    return name.split(" = ")[0].rstrip("0123456789.").lstrip("%")


def summarize(trace_dir: str, top: int = 30, frames: int = 1):
    xs = load_xplane(trace_dir)
    agg, cnt = device_op_totals(xs)
    tot = sum(agg.values())
    scale = 1e9 * frames  # ps -> ms, per frame
    print(f"total device op time: {tot / scale:.3f} ms/frame "
          f"({frames} frame(s))")
    groups = collections.Counter()
    for name, ps in agg.items():
        groups[op_kind(name)] += ps
    print("-- by op kind (ms/frame):")
    for k, ps in groups.most_common(15):
        print(f"  {ps / scale:8.3f}  {k}")
    print(f"-- top {top} individual ops (ms/frame):")
    for name, ps in agg.most_common(top):
        print(f"  {ps / scale:7.3f} x{cnt[name] // max(frames, 1):4d}"
              f"  {name[:100]}")
    return {"total_ms": tot / scale,
            "by_kind": {k: ps / scale for k, ps in groups.items()}}


def main(argv=None):
    p = argparse.ArgumentParser("hmvit_tpu xplane profile analyzer")
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--frames", type=int, default=1,
                   help="profiled step count (totals divided by this)")
    a = p.parse_args(argv)
    summarize(a.trace_dir, top=a.top, frames=a.frames)


if __name__ == "__main__":
    main()
