#!/bin/bash
# Round-4 TPU measurement queue — run once the axon tunnel is back.
# Serialized bench runs (one chip); each line logs the plan + the JSON result.
# Usage: bash scripts/r4_bench_queue.sh [logfile]
set -u
LOG="${1:-/tmp/r4_queue.log}"
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  # env pairs come as VAR=VAL args before the marker '--'
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  env "${envs[@]}" timeout 2400 python bench.py 2>>"$LOG" | tee -a "$LOG"
  echo "" | tee -a "$LOG"
}

# 0. sanity: current default plan (cache warm from r4 runs) — expect ~4.32
run "sdxl default (save:flash)" BENCH_MODEL=sdxl --

# 1. the INVALID earlier measurement, redone: light + save flash residuals.
#    light saves all plain-resnet activations; if it fits, it elides BOTH the
#    conv recompute and the flash fwd recompute.
run "sdxl light+save:flash" BENCH_REMAT='light+save:flash_out*,flash_lse*' --

# 2. stash8 on the flash residual: frees ~0.8 GB vs the default plan.
run "sdxl save:flash + stash8 flash_out" \
  BENCH_REMAT='save:flash_out*,flash_lse*' BENCH_STASH8='flash_out*' --

# 3. spend the freed ~0.8 GB on the 1280-level CROSS-attention outputs
#    (xattn_out: the self-attention outputs are already the saved flash_out
#    bytes; int8 halves the cost that OOM'd in bf16).
run "sdxl save:flash,xattn1280 + stash8 both" \
  BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out_c1280' \
  BENCH_STASH8='flash_out*,xattn_out_c1280' --

# 4. cross-attention outputs at every level, all int8 (~0.84 GB total;
#    ff_hidden is out of reach even in int8: 60 blocks x 84 MB at c1280)
run "sdxl save:flash,xattn* + stash8" \
  BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out*' \
  BENCH_STASH8='flash_out*,xattn_out*' --

# 5. light + int8 flash stash (if #1 OOMs, the int8 variant may fit)
run "sdxl light+save:flash + stash8" \
  BENCH_REMAT='light+save:flash_out*,flash_lse*' BENCH_STASH8='flash_out*' --

# 5b. int8 frozen base (models/quant.py): ~2.4 GB of HBM freed. NOTE: all
#     runs in this queue recompile once — the bench adapter-set fix (round 4:
#     adapters now created before fusion, 91 targets not 41) changed the
#     program; numbers are the honest like-for-like refresh.
#     First sanity: default plan + baseq (expect ~= #0 minus dequant cost).
run "sdxl baseq + save:flash" BENCH_BASEQ=int8 --

#     The plans the bf16 frontier denied by ~1 GB (round-4 table), now with
#     2.4 GB headroom: cross-attn outputs, then + self-attn outputs, then
#     light (plain-resnet saves) on top of the flash residuals.
run "sdxl baseq + save:flash,xattn*" \
  BENCH_BASEQ=int8 BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out*' --
run "sdxl baseq + save:flash,xattn*,attn_out*" \
  BENCH_BASEQ=int8 BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out*,attn_out*' --
run "sdxl baseq + light+save:flash" \
  BENCH_BASEQ=int8 BENCH_REMAT='light+save:flash_out*,flash_lse*' --
#     Gamble: the c1280 GEGLU hiddens in int8 (stash8) on top — ~2.5 GB;
#     fits only if the freed headroom is fully real.
run "sdxl baseq + save:flash,xattn*,ff1280 + stash8 ff" \
  BENCH_BASEQ=int8 BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out*,ff_hidden_c1280' \
  BENCH_STASH8='ff_hidden_c1280' --

#     int8+te: TEs quantized too (+~0.75 GB) with the conditioning
#     rematerialized — run the most aggressive non-gamble plan on top.
run "sdxl baseq+te + save:flash,xattn*,attn_out*" \
  BENCH_BASEQ='int8+te' BENCH_REMAT='save:flash_out*,flash_lse*,xattn_out*,attn_out*' --

#     Freed HBM may move the optimal batch (bs=12 was HBM-pressured at 3.75
#     in r3; bs=16 OOM'd): re-probe under baseq.
run "sdxl baseq bs12" BENCH_BASEQ=int8 BENCH_BS=12 --
run "sdxl baseq bs16 (gamble)" BENCH_BASEQ=int8 BENCH_BS=16 --

# 5c. anchor-config refresh with the fixed adapter set (was 19.44)
run "sdxl 512 bs16 anchor (fixed adapters)" BENCH_RES=512 BENCH_BS=16 --

# 6. SD15 flash block sweeps at its head dims (d=40 L=4096, d=80 L=1024)
echo "=== sd15 block sweep d=40 ===" | tee -a "$LOG"
SWEEP_B=8 SWEEP_L=4096 SWEEP_H=8 SWEEP_D=40 timeout 2400 python scripts/flash_block_sweep.py 2>&1 | tee -a "$LOG"
echo "=== sd15 block sweep d=80 ===" | tee -a "$LOG"
SWEEP_B=8 SWEEP_L=1024 SWEEP_H=8 SWEEP_D=80 timeout 2400 python scripts/flash_block_sweep.py 2>&1 | tee -a "$LOG"

# 7. sd15 remat-off baseline refresh (expect ~31.4)
run "sd15 default (remat auto->off)" BENCH_MODEL=sd15 --

# 8. on-chip flash parity incl. the ragged bucket lengths (padded+segment path)
echo "=== flash parity (incl. ragged) ===" | tee -a "$LOG"
timeout 2400 python scripts/flash_parity_tpu.py 2>&1 | tail -12 | tee -a "$LOG"

# 9. bucketed throughput (VERDICT r3 item 3 datapoint): grouped K=4 vs K=1
#    at the reference's real multi-resolution shapes; 832x1216 also exercises
#    the padded segment-masked flash inside the full train step.
run "sdxl bucketed K=4" BENCH_BUCKETS='1024x1024,832x1216,1216x832' BENCH_SCAN=4 --
run "sdxl bucketed K=1" BENCH_BUCKETS='1024x1024,832x1216,1216x832' BENCH_SCAN=1 --

echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
