#!/bin/bash
# Round-5 module-pad A/B queue: re-measure every bucket shape on the
# pad-once-per-module build (models/unet.py _module_pad_len) against the
# pre-fix numbers in bench_logs/r5_session.log:
#   832x1216 alone K=4: 0.125 imgs/s   | K=1 (mixed-implied): ~14.4 s/step
#   768x1280 alone K=4: 0.374 imgs/s   | 960x960 K=4: 0.044 imgs/s
#   bucketed 1024+832x1216 K=4: 0.15   | K=1: 0.979
# Square 1024px takes the identical code path as before (no pad) — the last
# leg re-pins the headline to prove no regression.
# Usage: bash scripts/r5_modpad_queue.sh [logfile]
set -u
LOG="${1:-bench_logs/r5_session.log}"
cd "$(dirname "$0")/.."
touch "$LOG"

export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache_tpu"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

run() {
  local timeout_s="$1"; shift
  local label="$1"; shift
  if grep -qxF "RESULT_OK $label" "$LOG"; then
    echo "=== $label: already logged, skipping ===" | tee -a "$LOG"
    return
  fi
  echo "=== $label ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  env "${envs[@]}" timeout "$timeout_s" python bench.py 2>>"$LOG" | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "[exit $rc]" | tee -a "$LOG"
  if [ "$rc" -eq 0 ]; then echo "RESULT_OK $label" | tee -a "$LOG"; fi
  echo "" | tee -a "$LOG"
}

# The direct A/Bs vs the pre-fix legs (same levers: bf16 base, default remat)
run 2400 "modpad 832x1216 alone K=4" BENCH_BUCKETS='832x1216' BENCH_SCAN=4 --
run 2400 "modpad 832x1216 alone K=1" BENCH_BUCKETS='832x1216' BENCH_SCAN=1 --
run 2400 "modpad 768x1280 alone K=4" BENCH_BUCKETS='768x1280' BENCH_SCAN=4 --
run 2400 "modpad 960x960 K=4" BENCH_BUCKETS='960x960' BENCH_SCAN=4 --

# The VERDICT item-5 deliverable config, fixed build
run 2400 "modpad bucketed K=4" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=4 --
run 2400 "modpad bucketed K=1" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=1 --

# Product default (int8 base + light+save) on the bucketed config
run 2400 "modpad bucketed K=4 baseq" BENCH_BASEQ=int8 \
  BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=4 --

# Headline regression guard: square 1024px on the new build
run 2400 "modpad headline sdxl baseq" BENCH_BASEQ=int8 --

echo "MODPAD QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
