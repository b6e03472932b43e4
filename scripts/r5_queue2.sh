#!/bin/bash
# Round-5 follow-up perf frontier — run AFTER scripts/r5_queue.sh and
# scripts/r5_ragged_diag.sh (one chip; never two bench processes at once).
# Motivated by the first r5 sweep: baseq(int8) + light+save:flash won at
# 4.42 imgs/s; the maximal save plan under baseq failed to compile (OOM).
# These probe the space between the winner and the failed maximal plan.
# Usage: bash scripts/r5_queue2.sh [logfile]
set -u
LOG="${1:-/tmp/r5_queue2.log}"
cd "$(dirname "$0")/.."
touch "$LOG"

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

# 1. winner + one more save tier: the c1280 cross-attention outs (the single
#    most expensive recompute after flash) — between 4.42's plan and the OOM.
run 3600 "baseq light+save:flash,xattn1280" \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*,xattn_out_c1280' --

# 2. same but with the int8 stash halving what the save-set keeps in HBM —
#    if 1 OOM'd, this is the fallback; if 1 fit, this may buy attn_out too.
run 3600 "baseq light+save:flash,xattn1280 stash8" \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*,xattn_out_c1280' \
  BENCH_STASH8='flash_out*,xattn_out_c1280' --

# 3. stash8 under the plain (non-light) winner plan: does int8-stashing the
#    flash residuals alone move the 4.42 needle?
run 3600 "baseq light+save:flash stash8 flash" \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*' \
  BENCH_STASH8='flash_out*' --

# 4. the non-baseq intermediate the r4 queue never reached: save:flash + all
#    xattn outs (no attn_out) in bf16 — isolates how much of 4.42 is baseq
#    HBM headroom vs the light recompute plan.
run 3600 "bf16 save:flash,xattn_out*" \
  BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out*' --

echo "QUEUE2 DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
