"""Reduce a captured xplane device trace to a per-op device-time table.

Companion to ``scripts/capture_trace.py`` (VERDICT r4 #1: replace the
microbench-derived attribution with a REAL on-device trace). Reads the
``*.xplane.pb`` under the given logdir, takes the ``/device:TPU:0`` plane's
"XLA Ops" line (one event per executed HLO op, duration in ps), and prints:

  * total window wall (first event start -> last event end), device busy
    time, and idle-gap total — pipeline bubbles the microbenches could not
    see;
  * the top-N ops by accumulated device time, with occurrence counts;
  * an aggregation into the step's regions (attention kernels fwd/bwd,
    other Pallas custom calls, fusions, copies/reshapes, ...).

Usage: python scripts/analyze_trace.py [logdir=artifacts/xprof] [topn=40]
"""

import collections
import sys
from pathlib import Path


def load_xspace(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(Path(logdir).rglob("*.xplane.pb"))
    if not pbs:
        raise SystemExit(f"no *.xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(pbs[-1].read_bytes())
    return xs, pbs[-1]


def device_events(xs, line_name="XLA Ops"):
    """[(name, start_ps, dur_ps)] from the TPU device plane's op line."""
    for p in xs.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        meta = {m.id: m.name for m in p.event_metadata.values()}
        for l in p.lines:
            if l.name != line_name:
                continue
            base_ps = l.timestamp_ns * 1000
            return [(meta.get(e.metadata_id, "?"),
                     base_ps + e.offset_ps, e.duration_ps)
                    for e in l.events]
    raise SystemExit(f"no TPU '{line_name}' line found")


# container HLOs that WRAP other ops on the same line (their duration
# double-counts every child; the bench window is one while loop)
def is_container(name: str) -> bool:
    base = name.lstrip("%").split(".")[0].split(" ")[0]
    return base in ("while", "conditional", "call")


def classify(name: str) -> str:
    """Region classifier. The Pallas attention custom-calls are named
    self_attn.* (flax module path); the backward kernel returns the
    (dq, dk, dv) 3-tuple, the forward a single array — `= (` distinguishes
    them (custom_vjp backward has no 'transpose' in its HLO op name)."""
    low = name.lower()
    if "custom-call" in low and "self_attn" in low:
        # long-form HLO text: "%self_attn.N = (tuple...) custom-call(..." —
        # the bwd kernel returns the (dq, dk, dv) tuple. Some profiler
        # versions emit only the short op name; bucket those as unsplit
        # rather than crashing the report.
        parts = low.lstrip("%").split("=", 1)
        if len(parts) < 2:
            return "attention (Pallas, direction unknown)"
        return ("attention bwd (Pallas)" if parts[1].strip().startswith("(")
                else "attention fwd (Pallas)")
    base = low.lstrip("%").split(".")[0].split(" ")[0]
    if base in ("copy", "copy-done", "copy-start", "slice-done"):
        return "layout copies"
    if "multiply_reduce_fusion" in base:
        return "LC attention + small grids (XLA)"
    if "convert_reduce_fusion" in base or "bitcast_reduce_fusion" in base:
        return "LN/likelihood reduces"
    if "fusion" in base:
        return "fusions (embed/FFN/LN glue)"
    return "other"


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/xprof"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs, pb = load_xspace(logdir)
    evs = device_events(xs)
    evs.sort(key=lambda e: e[1])
    t0 = evs[0][1]
    t1 = max(s + d for _, s, d in evs)
    wall_ps = t1 - t0
    inner = [e for e in evs if not is_container(e[0])]
    busy_ps = sum(d for _, _, d in inner)
    # idle gaps on the serialized op timeline (ops on this line do not
    # overlap; async ops live on their own line)
    gaps = 0
    cur = t0
    for _, s, d in inner:
        if s > cur:
            gaps += s - cur
        cur = max(cur, s + d)
    print(f"trace: {pb}")
    print(f"events: {len(inner)} (+{len(evs)-len(inner)} containers)   "
          f"wall {wall_ps/1e9:.3f} ms   "
          f"busy {busy_ps/1e9:.3f} ms ({100*busy_ps/wall_ps:.1f}%)   "
          f"idle gaps {gaps/1e9:.3f} ms ({100*gaps/wall_ps:.1f}%)")

    by_op = collections.Counter()
    count = collections.Counter()
    by_base = collections.Counter()
    for n, _, d in inner:
        by_op[n] += d
        count[n] += 1
        by_base[n.lstrip("%").split(" ")[0].split(".")[0]] += d
    print(f"\ntop {topn} ops by device time:")
    print(f"{'ms':>9} {'%':>5} {'n':>6}  op")
    for n, d in by_op.most_common(topn):
        print(f"{d/1e9:9.3f} {100*d/busy_ps:5.1f} {count[n]:6d}  {n[:90]}")

    print("\nby op base name:")
    for b, d in by_base.most_common(20):
        print(f"{d/1e9:9.3f} ms {100*d/busy_ps:5.1f}%  {b}")

    by_region = collections.Counter()
    for n, _, d in inner:
        by_region[classify(n)] += d
    print("\nby region:")
    for r, d in by_region.most_common():
        print(f"{d/1e9:9.3f} ms {100*d/busy_ps:5.1f}%  {r}")


if __name__ == "__main__":
    main()
