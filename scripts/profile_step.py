"""Capture a jax.profiler trace of the train step and print an op-time table.

The profile-and-iterate loop for the headline bench: run real train steps
under jax.profiler.trace, then parse the .xplane.pb directly (the
tensorboard_plugin_profile converter in this image mismatches TF, so we read
the XSpace proto ourselves) and print the top device ops by total time —
enough to see whether the step is MXU-bound (conv/dot fusions dominating) or
stalled on copies/HBM/host, without a TensorBoard UI.

Env: same knobs as bench.py (BENCH_MODEL/BENCH_BS/BENCH_RES/BENCH_STEPS), plus
PROFILE_DIR (default /tmp/sd_profile). Prints nothing to stdout except the
table (bench.py's JSON line goes to stdout too — pipe accordingly).
"""

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def summarize_xplane(trace_dir: str, top_n: int = 30):
    """Parse captured .xplane.pb files; print per-op and per-category time."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print(f"[profile] no xplane found under {trace_dir}", file=sys.stderr)
        return
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        op_time = defaultdict(int)
        op_count = defaultdict(int)
        total = 0
        for line in plane.lines:
            # XLA op lines carry the per-op executions; skip module/step lines
            if "XLA Op" not in line.name and "XLA Ops" not in line.name:
                continue
            for e in line.events:
                name = plane.event_metadata[e.metadata_id].name
                op_time[name] += e.duration_ps
                op_count[name] += 1
                total += e.duration_ps
        if not op_time:
            # fall back: aggregate every line
            for line in plane.lines:
                for e in line.events:
                    name = plane.event_metadata[e.metadata_id].name
                    op_time[name] += e.duration_ps
                    op_count[name] += 1
                    total += e.duration_ps
        if not op_time:
            continue

        print(f"\n===== plane: {plane.name} (total device op time {total/1e12:.3f} s)")
        cat_time = defaultdict(int)
        for name, d in op_time.items():
            m = re.match(r"([a-zA-Z\-_]+)", name)
            cat = m.group(1).rstrip("._-0123456789") if m else "other"
            cat_time[cat] += d
        print("-- by category:")
        for cat, d in sorted(cat_time.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {cat:32s} {d/1e9:10.3f} ms  {100*d/total:5.1f}%")
        print(f"-- top {top_n} ops:")
        for name, d in sorted(op_time.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {name[:90]:90s} {d/1e9:9.3f} ms x{op_count[name]:<5d} {100*d/total:5.1f}%")


def main():
    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/sd_profile")
    os.makedirs(trace_dir, exist_ok=True)

    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    os.environ.setdefault("BENCH_STEPS", "6")
    import bench

    with jax.profiler.trace(trace_dir):
        bench.main()

    summarize_xplane(trace_dir)


if __name__ == "__main__":
    main()
