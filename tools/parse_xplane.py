"""Aggregate XLA op self-times from a jax.profiler xplane.pb capture.

Usage: python tools/parse_xplane.py <trace_dir> [top_n=18]

Prints, per device plane and trace line, total time and the top ops by
summed self-time.  This is THE way to A/B op-level changes on the axon
relay: wall-clock micro-benchmarks are ±100% at microsecond scales, while
these hardware-counter self-times are stable across runs (CLAUDE.md).
Pairs with tools/profile_train_step.py / tools/profile_decode.py.
"""
import os
os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
import sys, glob, collections
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob(sys.argv[1] + "/**/*.xplane.pb", recursive=True))[-1]
sp = xplane_pb2.XSpace()
sp.ParseFromString(open(path, "rb").read())

for plane in sp.planes:
    if "TPU" not in plane.name and "/device" not in plane.name.lower():
        continue
    ev_meta = {k: v for k, v in plane.event_metadata.items()}
    print(f"== plane: {plane.name} ({len(plane.lines)} lines)")
    for line in plane.lines:
        if not line.events:
            continue
        tot = collections.Counter()
        for ev in line.events:
            md = ev_meta.get(ev.metadata_id)
            name = md.name if md else "?"
            tot[name] += ev.duration_ps / 1e9  # -> ms
        total = sum(tot.values())
        print(f"-- line: {line.name}: {len(line.events)} events, "
              f"total {total:.2f} ms")
        top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 18
        for name, d in tot.most_common(top_n):
            print(f"   {d:9.3f} ms  {100*d/total:5.1f}%  {name[:100]}")
