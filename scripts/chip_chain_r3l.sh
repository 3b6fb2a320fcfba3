#!/bin/bash
# Round-3 chain L: conv_thin kernel validation + in-context A/B, queued
# behind chain K (waits for its PID, then reuses its probe-gated pattern).
#
# Arms:
#   1. conv_thin real-Mosaic compile check (tiny + flagship shapes FIRST,
#      round-2 lesson)
#   2. in-context A/B: full step with TERRAIN_PALLAS_THIN=1
#   3. combined arm: THIN=1 + CONVS2=1 (if both win alone, the final
#      default is both — interactions matter on this relay)
set -u
cd /root/repo
LOG=/tmp/attr_r3
QL="$LOG/queue.log"

if [ -f /tmp/chaink.pid ] && kill -0 "$(cat /tmp/chaink.pid)" 2>/dev/null; then
  echo "=== chain L waiting on chain K pid $(cat /tmp/chaink.pid) $(date) ===" >> "$QL"
  tail --pid="$(cat /tmp/chaink.pid)" -f /dev/null
fi
echo "=== chain L starting $(date) ===" >> "$QL"

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

if run "$LOG/convthin_check.log" 2400 python scripts/chip_check_convthin.py; then
  echo "=== chain L: conv_thin compile check OK $(date) ===" >> "$QL"
  TERRAIN_PALLAS_THIN=1 run "$LOG/convthin_on.log" 2400 \
    python scripts/attr_bench.py full
  tail -1 "$LOG/convthin_on.log" | grep '^{' | \
    sed 's/^{/{"tag": "convthin_on", /' >> "$LOG/attr_results.jsonl" || true
  TERRAIN_PALLAS_THIN=1 TERRAIN_PALLAS_CONVS2=1 run "$LOG/convthin_convs2_on.log" 2400 \
    python scripts/attr_bench.py full
  tail -1 "$LOG/convthin_convs2_on.log" | grep '^{' | \
    sed 's/^{/{"tag": "convthin_convs2_on", /' >> "$LOG/attr_results.jsonl" || true
else
  echo "=== chain L: conv_thin compile check FAILED $(date) ===" >> "$QL"
fi
echo "=== chain L done $(date) ===" >> "$QL"
