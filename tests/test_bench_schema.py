"""bench.py artifact schema: the JSON line must be self-describing.

Round-4 lesson: BENCH_r*.json carried metric/value/mfu but not the lever set
(remat plan, stash8, baseq, fuse, scan K, adapter-target count), so
cross-round comparisons silently mixed pre/post-correction programs. The
bench now emits a `config` block with every lever; this test runs the REAL
bench code path (BENCH_TINY=1 swaps in the tiny model configs) in a
subprocess and pins the schema.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQUIRED_TOP = {"metric", "value", "unit", "vs_baseline", "config"}
REQUIRED_CONFIG = {
    "model", "resolution", "batch_size", "remat", "stash8", "baseq",
    "fuse_qkv", "flash", "scan_k", "buckets", "adapter_targets", "lora_rank",
}


def _run_bench(extra_env):
    env = dict(os.environ)
    env.update(
        BENCH_TINY="1",
        BENCH_PLATFORM="cpu",
        BENCH_DEVICE_TIMEOUT="120",
        JAX_PLATFORMS="cpu",
    )
    env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in stdout: {r.stdout[-1000:]}"
    return json.loads(lines[-1])


@pytest.mark.slow
def test_bench_json_schema_default():
    out = _run_bench({
        "BENCH_MODEL": "sdxl", "BENCH_RES": "64", "BENCH_BS": "2",
        "BENCH_STEPS": "2", "BENCH_SCAN": "2",
    })
    assert REQUIRED_TOP <= set(out), out
    cfg = out["config"]
    assert REQUIRED_CONFIG <= set(cfg), cfg
    assert cfg["model"] == "sdxl"
    assert cfg["resolution"] == 64
    assert cfg["batch_size"] == 2
    assert cfg["scan_k"] == 2
    assert cfg["baseq"] == "none"
    assert cfg["adapter_targets"] > 0
    assert isinstance(out["value"], float) and out["value"] > 0
    assert isinstance(out["vs_baseline"], float)


@pytest.mark.slow
def test_bench_json_schema_levers_recorded():
    out = _run_bench({
        "BENCH_MODEL": "sdxl", "BENCH_RES": "64", "BENCH_BS": "2",
        "BENCH_STEPS": "2", "BENCH_SCAN": "1",
        "BENCH_BASEQ": "int8",
        "BENCH_REMAT": "save:flash_out*,flash_lse*",
        "BENCH_STASH8": "flash_out*",
        "BENCH_FUSE_QKV": "0",
    })
    cfg = out["config"]
    assert cfg["baseq"] == "int8"
    assert cfg["remat"] == "save:flash_out*,flash_lse*"
    assert cfg["stash8"] == "flash_out*"
    assert cfg["fuse_qkv"] is False
    assert cfg["scan_k"] == 1
