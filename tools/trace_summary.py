"""Summarize a jax.profiler xprof trace: device duty cycle + top ops.

Parses the raw .xplane.pb (tensorflow.tsl xplane proto — TF ships in this
image as a library only) from a trace directory produced by
``guardx_tpu.utils.profiling.trace`` / ``--profile`` and reports, per
device plane:

- wall span of the traced region, device busy time, duty cycle
- top-N op names by self time (with occurrence counts)

This is the measurement VERDICT r3 #3 asks for ("capture a jax.profiler
trace of one epoch and report device duty-cycle/HBM utilization"): duty
cycle comes from the op timeline; for HBM utilization, cross-reference
the op mix (fusions over small per-env arrays are bandwidth/latency-bound
by construction).

Usage: python tools/trace_summary.py <trace_dir> [top_n]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def load_xplanes(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    spaces = []
    for p in sorted(paths)[-1:]:  # latest session
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def summarize_plane(plane, top_n=25):
    """Busy time + per-op self time for one device plane."""
    # pick the line with the most events (the XLA Ops timeline)
    best = None
    for line in plane.lines:
        if best is None or len(line.events) > len(best.events):
            best = line
    if best is None or not best.events:
        return None
    meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
    t0, t1 = None, None
    per_op = defaultdict(lambda: [0.0, 0])
    busy_ps = 0
    for ev in best.events:
        name = meta.get(ev.metadata_id, str(ev.metadata_id))
        start = ev.offset_ps
        dur = ev.duration_ps
        busy_ps += dur
        per_op[name][0] += dur
        per_op[name][1] += 1
        t0 = start if t0 is None else min(t0, start)
        t1 = start + dur if t1 is None else max(t1, start + dur)
    span_ps = max(t1 - t0, 1)
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top_n]
    return {
        "line": best.name,
        "events": sum(len(l.events) for l in plane.lines),
        "span_ms": span_ps / 1e9,
        "busy_ms": busy_ps / 1e9,
        "duty": busy_ps / span_ps,
        "top": [
            (name, d / 1e9, n, d / span_ps) for name, (d, n) in rows
        ],
    }


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    for path, xs in load_xplanes(trace_dir):
        print(f"== {path}")
        for plane in xs.planes:
            if "device:" not in plane.name and "TPU" not in plane.name:
                continue
            s = summarize_plane(plane, top_n)
            if s is None:
                continue
            print(f"\nplane {plane.name} (line '{s['line']}', "
                  f"{s['events']} events)")
            print(f"  span {s['span_ms']:.1f} ms, busy {s['busy_ms']:.1f} "
                  f"ms, duty cycle {100 * s['duty']:.1f}%")
            print(f"  {'op':60s} {'self ms':>9s} {'count':>7s} {'%span':>6s}")
            for name, ms, n, frac in s["top"]:
                print(f"  {name[:60]:60s} {ms:9.2f} {n:7d} "
                      f"{100 * frac:6.2f}")


if __name__ == "__main__":
    main()
