#!/bin/bash
# Round-4 PRIORITY measurement queue — the highest-value subset of
# r4_bench_queue.sh, ordered for a ~1h window with a cold compile cache.
# Each SDXL@1024px run cold-compiles in ~7-9 min; budget ~4-5 runs.
# Usage: bash scripts/r4_priority_queue.sh [logfile]
# SUPERSEDED by scripts/r5_queue.sh (resumable, exit-status-logged, budgeted
# from measured compile times); kept as the r4 record. Default log is
# untracked (ADVICE r4): commit only finalized snapshots into bench_logs/.
set -u
LOG="${1:-/tmp/r4_priority_queue.log}"
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  env "${envs[@]}" timeout 1500 python bench.py 2>>"$LOG" | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "[exit $rc]" | tee -a "$LOG"  # timeouts/crashes visible per run (ADVICE r4)
  echo "" | tee -a "$LOG"
}

# 1. headline refresh with the fixed 91-target adapter set (was 4.32 with 41)
#    — also warms the cache for the driver's end-of-round bench run.
run "sdxl default (save:flash, fixed adapters)" BENCH_MODEL=sdxl --

# 2. the strongest >=50%-MFU shot: int8 frozen base frees ~2.4 GB, spent on
#    saving cross-attn AND self-attn outputs at every level.
run "sdxl baseq + save:flash,xattn*,attn_out*" \
  BENCH_BASEQ=int8 BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out*,attn_out*' --

# 3. second shot: light (plain-resnet saves) on top of flash residuals under baseq.
run "sdxl baseq + light+save:flash" \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*' --

# 4. sd15 remat-off refresh with fixed adapters (was 31.4) — cheap compile.
run "sd15 default (remat auto->off)" BENCH_MODEL=sd15 --

# 5. zero-extra-HBM lever available without baseq: int8 stash of the flash
#    residuals + spend the freed 0.8 GB on c1280 cross-attn outputs.
run "sdxl save:flash,xattn1280 + stash8 both" \
  BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out_c1280' \
  BENCH_STASH8='flash_out*,xattn_out_c1280' --

# 6. bucketed K=4 vs K=1 (VERDICT r3 item 3 datapoint); 2 buckets to bound
#    compile count — 1024x1024 reuses run 1's per-resolution cache entry.
run "sdxl bucketed K=4" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=4 --
run "sdxl bucketed K=1" BENCH_BUCKETS='1024x1024,832x1216' BENCH_SCAN=1 --

# 7. anchor-config refresh (was 19.44) — cheap 512px compile.
run "sdxl 512 bs16 anchor (fixed adapters)" BENCH_RES=512 BENCH_BS=16 --

echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
