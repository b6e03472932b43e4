#!/bin/bash
# Watch the axon tunnel; when it answers, run the round-4 measurement queue.
# Probes are bounded (timeout) because jax.devices() blocks forever when the
# tunnel is down. Usage: bash scripts/tunnel_watch.sh [queue_log]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/root/repo/bench_logs/r4_queue.log}"
STATE=/tmp/tunnel_watch.state
echo "watch start $(date -u +%F' '%T)" > "$STATE"

for i in $(seq 1 60); do  # up to ~10h at 10-min spacing
  if timeout 180 python - <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("tunnel OK:", d)
EOF
  then
    echo "tunnel UP at $(date -u +%F' '%T), launching queue" | tee -a "$STATE"
    bash scripts/r4_bench_queue.sh "$LOG"
    echo "queue finished $(date -u +%F' '%T)" | tee -a "$STATE"
    exit 0
  fi
  echo "probe $i down $(date -u +%F' '%T)" >> "$STATE"
  sleep 600
done
echo "gave up $(date -u +%F' '%T)" | tee -a "$STATE"
exit 1
