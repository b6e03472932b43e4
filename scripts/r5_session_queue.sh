#!/bin/bash
# Round-5 consolidated session queue — prioritized remainder after the VM
# restart ate the first sweep's /tmp logs. Durable log by default (bench_logs/
# survives restarts; commit snapshots as milestones land). Order:
#   1. the baseq+light+save winner, re-measured into a durable log
#   2. 32-step loss-trajectory A/B gating its promotion to the product default
#   3. the two remaining ragged-bucket diagnosis legs (flash OFF + op profile)
#   4. bucketed K=4 vs K=1 (VERDICT r3 item 3 / r4 item 5)
#   5. SD15 ceiling profile + d=40/80 block sweeps (VERDICT item 7)
#   6. on-chip flash parity incl. ragged lengths
#   7. baseq batch-size frontier probes
# Usage: bash scripts/r5_session_queue.sh [logfile]
set -u
LOG="${1:-bench_logs/r5_session.log}"
cd "$(dirname "$0")/.."
touch "$LOG"

# Persistent compile cache: session deaths keep killing runs mid-queue, and
# every restart repays 400-600 s TPU compiles for programs already built.
# JAX reads these from the environment at import; cache errors are non-fatal.
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

# 2. promotion-gating trajectory A/B (32 steps, logged losses)
run 3600 "sdxl trajectory bf16" BENCH_LOG_LOSSES=1 BENCH_STEPS=32 --
run 3600 "sdxl trajectory baseq light+save" BENCH_LOG_LOSSES=1 BENCH_STEPS=32 \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*' --

# 3. bucketed K=4 vs K=1 (the VERDICT item-5 deliverable — run before the
#    diagnosis legs so it lands even if the session is cut short)
run 3600 "sdxl bucketed K=4" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=4 --
run 3600 "sdxl bucketed K=1" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=1 --

# 4. remaining ragged-bucket diagnosis legs. Known so far: the flash kernel
#    itself is fine at padded-ragged lengths (microbench 51.7 ms ~= square),
#    yet even the block-aligned nonsquare 768x1280 runs 11x slow (0.374
#    imgs/s), and flash-OFF K=4 OOMs (f32[8,10,3952,3952] einsum logits).
#    Discriminator: a SQUARE but ragged bucket (960x960 -> L=3600, padded
#    flash) separates "ragged attention is slow" (960 slow) from "nonsquare
#    conv/layout is slow" (960 fast).
run 2400 "sdxl square-ragged 960x960 K=4" BENCH_BUCKETS='960x960' BENCH_SCAN=4 --
runcmd 2400 "ragged 832x1216 profile" \
  env BENCH_BUCKETS='832x1216' BENCH_SCAN=1 BENCH_STEPS=4 \
  PROFILE_DIR=/tmp/ragged_profile python scripts/profile_step.py

# 5. SD15 ceiling profile + d=40/80 block sweeps
runcmd 2400 "sd15 profile breakdown" \
  env BENCH_MODEL=sd15 BENCH_RES=512 BENCH_BS=8 PROFILE_DIR=/tmp/sd15_profile \
  python scripts/profile_step.py
runcmd 2400 "sd15 block sweep d=40" \
  env SWEEP_B=8 SWEEP_L=4096 SWEEP_H=8 SWEEP_D=40 python scripts/flash_block_sweep.py
runcmd 2400 "sd15 block sweep d=80" \
  env SWEEP_B=8 SWEEP_L=1024 SWEEP_H=8 SWEEP_D=80 python scripts/flash_block_sweep.py

# 6. on-chip flash parity incl. ragged bucket lengths
runcmd 2400 "flash parity incl ragged" python scripts/flash_parity_tpu.py

# 6b. einsum A/B at K=1 (the K=4 einsum program OOM'd: 4.67 GB logits in the
#     rematted bwd; K=1 may still OOM — cheap to find out, compile fails fast)
run 2400 "ragged 832x1216 flash OFF K=1" BENCH_BUCKETS='832x1216' BENCH_SCAN=1 BENCH_FLASH=0 --

# 7. baseq batch-size frontier
run 3600 "sdxl baseq bs12" BENCH_BASEQ=int8 BENCH_BS=12 --
run 3600 "sdxl baseq bs16 (gamble)" BENCH_BASEQ=int8 BENCH_BS=16 --

echo "SESSION QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
