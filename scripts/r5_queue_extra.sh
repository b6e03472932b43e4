#!/bin/bash
# Round-5 EXTRA measurements — run AFTER scripts/r5_queue.sh completes (one
# chip; never run two bench processes concurrently). Same resumable/exit-
# status discipline as r5_queue.sh.
# Usage: bash scripts/r5_queue_extra.sh [logfile]
set -u
LOG="${1:-/tmp/r5_queue_extra.log}"
cd "$(dirname "$0")/.."
touch "$LOG"

runcmd() {
  local timeout_s="$1"; shift
  local label="$1"; shift
  if grep -qxF "RESULT_OK $label" "$LOG"; then
    echo "=== $label: already logged, skipping ===" | tee -a "$LOG"
    return
  fi
  echo "=== $label ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$timeout_s" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "[exit $rc]" | tee -a "$LOG"
  if [ "$rc" -eq 0 ]; then echo "RESULT_OK $label" | tee -a "$LOG"; fi
  echo "" | tee -a "$LOG"
}

# Inference-side counterparts of the train headline: the validation-render
# sampling loop (2x-batched CFG UNet forwards + batched VAE decode).
runcmd 3600 "inference sdxl 1024 batch4" \
  env BENCH_RES=1024 BENCH_IMGS=4 BENCH_BATCH=4 python scripts/bench_inference.py
runcmd 2400 "inference sdxl 768 batch4" \
  env BENCH_RES=768 BENCH_IMGS=4 BENCH_BATCH=4 python scripts/bench_inference.py

echo "EXTRA QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
