#!/bin/bash
# Round-5 ragged-bucket slowdown diagnosis. The bucketed K=4 queue run showed
# the 832x1216 program at ~166s/call vs ~7.7s for 1024x1024 (same pixel count
# within 4%) — ~21x. These three single-bucket runs separate the hypotheses:
#   1) 832x1216 alone       -> the slow program, isolated (ragged attn 3952
#                              tokens -> padded segment-masked flash + conv
#                              at 104x152)
#   2) 768x1280 alone       -> non-square but 128-multiple attention lengths
#                              (48*80=3840): slow here = convs/non-square
#                              layout problem, fast = the padded flash path
#   3) 832x1216 flash OFF   -> einsum attention at the same shapes: if this
#                              is FASTER than (1), the padded flash kernel is
#                              the bug, not the shapes
# Usage: bash scripts/r5_ragged_diag.sh [logfile]
set -u
LOG="${1:-/tmp/r5_ragged_diag.log}"
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

# 0. kernel microbench at the ragged lengths themselves: padded+segment-masked
#    flash fwd+grad through the REAL flash_mha path (pad plan + seg ids +
#    slice) at L=3952/988 vs the square 4096/1024 — if the kernel is fast
#    here, the slowdown is NOT the flash path. (flash_block_sweep.py calls
#    _named_flash with valid_len=0, which is NOT what flash_mha does at
#    ragged lengths — hence the dedicated script.)
runcmd 2400 "ragged flash microbench" python scripts/ragged_flash_microbench.py

# 1-3. whole-step isolation
run 2400 "ragged 832x1216 alone K=4" BENCH_BUCKETS='832x1216' BENCH_SCAN=4 --
run 2400 "nonsquare 768x1280 alone K=4" BENCH_BUCKETS='768x1280' BENCH_SCAN=4 --
run 2400 "ragged 832x1216 flash OFF K=4" BENCH_BUCKETS='832x1216' BENCH_SCAN=4 BENCH_FLASH=0 --

# 4. op-level trace of the ragged program: which ops eat the ~29s/step
runcmd 2400 "ragged 832x1216 profile" \
  env BENCH_BUCKETS='832x1216' BENCH_SCAN=1 BENCH_STEPS=4 \
  PROFILE_DIR=/tmp/ragged_profile python scripts/profile_step.py

echo "DIAG DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
