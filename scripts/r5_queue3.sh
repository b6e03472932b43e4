#!/bin/bash
# Round-5 promotion-evidence queue — the prioritized remainder of the first
# r5 sweep (whose /tmp logs were lost to a VM restart; only the winner fact
# survived: baseq int8 + light+save:flash at 4.42 imgs/s, maximal plan OOM).
# Order: (1) re-measure the winner so the number exists in a durable log,
# (2) the 32-step loss-trajectory A/B that gates promoting it to the product
# default (VERDICT r4 item 3), (3) bucketed K=4 vs K=1 (item 5), (4) SD15
# ceiling profile + block sweeps (item 7), (5) on-chip flash parity incl.
# ragged, (6) baseq batch-size frontier probes.
# Usage: bash scripts/r5_queue3.sh [logfile]
set -u
LOG="${1:-/tmp/r5_queue3.log}"
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

# 1. the winner, re-measured into a durable log
run 3600 "sdxl baseq + light+save:flash" \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*' --

# 2. promotion-gating trajectory A/B (32 steps, logged losses; programs
#    cache-hit from run 1 / the headline runs)
run 3600 "sdxl trajectory bf16" BENCH_LOG_LOSSES=1 BENCH_STEPS=32 --
run 3600 "sdxl trajectory baseq light+save" BENCH_LOG_LOSSES=1 BENCH_STEPS=32 \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*' --

# 3. bucketed K=4 vs K=1 (VERDICT r3 item 3 / r4 item 5)
run 3600 "sdxl bucketed K=4" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=4 --
run 2400 "sdxl bucketed K=1" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=1 --

# 4. SD15 ceiling profile (VERDICT item 7) + d=40/80 block sweeps
runcmd 2400 "sd15 profile breakdown" \
  env BENCH_MODEL=sd15 BENCH_RES=512 BENCH_BS=8 PROFILE_DIR=/tmp/sd15_profile \
  python scripts/profile_step.py
runcmd 2400 "sd15 block sweep d=40" \
  env SWEEP_B=8 SWEEP_L=4096 SWEEP_H=8 SWEEP_D=40 python scripts/flash_block_sweep.py
runcmd 2400 "sd15 block sweep d=80" \
  env SWEEP_B=8 SWEEP_L=1024 SWEEP_H=8 SWEEP_D=80 python scripts/flash_block_sweep.py

# 5. on-chip flash parity incl. ragged bucket lengths
runcmd 2400 "flash parity incl ragged" python scripts/flash_parity_tpu.py

# 6. baseq batch-size frontier
run 3600 "sdxl baseq bs12" BENCH_BASEQ=int8 BENCH_BS=12 --
run 3600 "sdxl baseq bs16 (gamble)" BENCH_BASEQ=int8 BENCH_BS=16 --

echo "QUEUE3 DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
