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


def summarize_xplane(trace_dir: str, top_n: int = 30):
    """Parse captured .xplane.pb files; print per-op and per-category time.

    Uses TF's bundled xplane proto with the NATIVE (upb) protobuf
    implementation — a full-model trace is ~2 GB and the pure-python parser
    never finishes it. The sync 'XLA Ops' lane is the device critical path;
    'Async XLA Ops' (prefetch copies) overlap it and are reported separately.
    """
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
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            op_time = defaultdict(int)
            op_count = defaultdict(int)
            cat_time = defaultdict(int)
            total = 0
            for e in line.events:
                name = plane.event_metadata[e.metadata_id].name.lstrip("%")
                op_time[name] += e.duration_ps
                op_count[name] += 1
                total += e.duration_ps
                m = re.match(r"([a-zA-Z\-_]+)", name)
                cat_time[m.group(1).rstrip("._-0123456789") if m else "other"] += e.duration_ps
            if not total:
                continue
            print(f"\n===== {plane.name} / {line.name}: total {total/1e12:.3f} s")
            print("-- by category:")
            for cat, d in sorted(cat_time.items(), key=lambda kv: -kv[1])[:14]:
                print(f"  {cat:36s} {d/1e9:10.1f} ms  {100*d/total:5.1f}%")
            if line.name == "XLA Ops":
                print(f"-- top {top_n} ops:")
                for name, d in sorted(op_time.items(), key=lambda kv: -kv[1])[:top_n]:
                    print(f"  {name[:95]:95s} {d/1e9:8.1f} ms x{op_count[name]:<5d}")


def main():
    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/sd_profile")

    # Summarize-only mode: analyze a trace captured earlier.
    if len(sys.argv) > 1 and sys.argv[1] == "--summarize":
        summarize_xplane(sys.argv[2] if len(sys.argv) > 2 else trace_dir)
        return

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
