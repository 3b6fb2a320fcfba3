#!/bin/bash
# Round-3 chain O3: generation-throughput numbers + headline re-measure.
#
# Queued behind chain O2 (kernel A/B matrix).  Arms:
#   1. bench_gen.py --bs 4 8     — fused two-stage 512px sampler: compute
#      imgs/s (fetch-fenced scalar) vs delivered imgs/s (device uint8 +
#      full relay fetch).  First numbers for this path.
#   2. bench.py                  — flagship train-step headline with
#      whatever kernel defaults are in the tree when this arm runs (the
#      default flip lands between O2 and this arm if the matrix says so).
set -u
cd /root/repo
LOG=/tmp/chipo
QL="$LOG/queue.log"
mkdir -p "$LOG"

if [ -f /tmp/chaino2.pid ] && kill -0 "$(cat /tmp/chaino2.pid)" 2>/dev/null; then
  echo "=== chain O3 waiting on chain O2 pid $(cat /tmp/chaino2.pid) $(date) ===" >> "$QL"
  tail --pid="$(cat /tmp/chaino2.pid)" -f /dev/null
fi
echo "=== chain O3 starting $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
  echo "probe: relay live $(date)" >> "$QL"
}

run() {
  local log="$1" to="$2"; shift 2
  for attempt in 1 2; do
    probe
    timeout "$to" "$@" > "$log" 2>&1 && return 0
    echo "arm failed (attempt $attempt, $(date)): $*" >> "$QL"
    sleep 60
  done
  return 1
}

export TERRAIN_DTYPE=bf16

run "$LOG/bench_gen.log" 3000 python scripts/bench_gen.py --bs 4 8
run "$LOG/bench_headline.log" 3000 python bench.py
echo "=== chain O3 done $(date) ===" >> "$QL"
