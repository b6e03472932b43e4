#!/bin/bash
# Round-5 TPU measurement queue — executes the stalled round-4 campaign with
# the three fixes VERDICT r4 (weak #3) demanded:
#   * RESUMABLE: a completed label writes "RESULT_OK <label>"; re-runs skip it.
#   * exit-status-logged: every run ends with "[exit N]" (ADVICE r4).
#   * budgeted from MEASURED compile times: baseq programs cold-compiled
#     >25 min in r4 (bench_logs/r4_queue.log run 2 timed out at 1500s), so
#     those runs get 3600s; plain refreshes get 1800-2400s.
# Default log is untracked (/tmp); commit only finalized snapshots into
# bench_logs/ (ADVICE r4).
# Usage: bash scripts/r5_queue.sh [logfile]
set -u
LOG="${1:-/tmp/r5_queue.log}"
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

# generic command runner with the same skip/exit-status discipline
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

# ---- 1. driver-visible headline refreshes (corrected 91-target adapter set;
#         run 1 also warms the compile cache for the end-of-round driver bench)
run 2400 "sdxl default (save:flash)" BENCH_MODEL=sdxl --
run 1800 "sd15 default (remat auto->off)" BENCH_MODEL=sd15 --
run 2400 "sdxl 512 bs16 anchor" BENCH_RES=512 BENCH_BS=16 --

# ---- 2. bucketed K=4 vs K=1 (VERDICT r3 item 3 / r4 item 5): 832x1216
#         exercises the padded segment-masked flash inside the real train step
run 3600 "sdxl bucketed K=4" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=4 --
run 2400 "sdxl bucketed K=1" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=1 --

# ---- 3. the >=50%-MFU campaign (int8 frozen base frees ~2.4 GB of HBM)
run 3600 "sdxl baseq + save:flash" BENCH_BASEQ=int8 --
run 3600 "sdxl baseq + save:flash,xattn*,attn_out*" \
  BENCH_BASEQ=int8 BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out*,attn_out*' --
run 3600 "sdxl baseq + light+save:flash" \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*' --
# zero-baseq lever: int8 stash of the flash residuals buys the c1280 xattn outs
run 3600 "sdxl save:flash,xattn1280 + stash8 both" \
  BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out_c1280' \
  BENCH_STASH8='flash_out*,xattn_out_c1280' --

# ---- 4. SD15 ceiling profile (VERDICT item 7): committed breakdown + the
#         d=40/80 flash block sweeps at SD15's actual attention shapes
runcmd 2400 "sd15 profile breakdown" \
  env BENCH_MODEL=sd15 BENCH_RES=512 BENCH_BS=8 PROFILE_DIR=/tmp/sd15_profile \
  python scripts/profile_step.py
runcmd 2400 "sd15 block sweep d=40" \
  env SWEEP_B=8 SWEEP_L=4096 SWEEP_H=8 SWEEP_D=40 python scripts/flash_block_sweep.py
runcmd 2400 "sd15 block sweep d=80" \
  env SWEEP_B=8 SWEEP_L=1024 SWEEP_H=8 SWEEP_D=80 python scripts/flash_block_sweep.py

# ---- 5. on-chip flash parity incl. ragged bucket lengths (VERDICT item 5b)
runcmd 2400 "flash parity incl ragged" python scripts/flash_parity_tpu.py

# ---- 6. full-size 30-step loss-trajectory A/B (VERDICT item 3): bf16 default
#         vs int8 base vs int8 stash — programs cache-hit from section 1/3
run 3600 "sdxl trajectory bf16" BENCH_LOG_LOSSES=1 BENCH_STEPS=32 --
run 3600 "sdxl trajectory baseq" BENCH_LOG_LOSSES=1 BENCH_STEPS=32 BENCH_BASEQ=int8 --
run 3600 "sdxl trajectory stash8" BENCH_LOG_LOSSES=1 BENCH_STEPS=32 \
  BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out_c1280' \
  BENCH_STASH8='flash_out*,xattn_out_c1280' --

# ---- 7. HBM-headroom probes under baseq (batch-size frontier)
run 3600 "sdxl baseq bs12" BENCH_BASEQ=int8 BENCH_BS=12 --
run 3600 "sdxl baseq bs16 (gamble)" BENCH_BASEQ=int8 BENCH_BS=16 --

echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
