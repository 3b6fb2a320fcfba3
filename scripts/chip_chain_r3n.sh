#!/bin/bash
# Round-3 chain N: TERRAIN_ACT_BWD A/B (leaky-backward select fused into
# the Pallas dW kernels), queued behind chain M.
#
# Arms:
#   1. real-Mosaic compile check (the extra (1,TH,W,F) VMEM block in each
#      dW kernel is the risk; tiny shapes first, round-2 lesson)
#   2. in-context A/B: full step with TERRAIN_ACT_BWD=1 (baseline is
#      chain K's convs2_off tag — current defaults, ACT_BWD off)
#   3. interaction probe: ACT_BWD=1 + CONVS2=1 (if chain K keeps conv_s2,
#      the s2 dW kernel also carries the fused select)
set -u
cd /root/repo
LOG=/tmp/attr_r3
QL="$LOG/queue.log"
mkdir -p "$LOG"

if [ -f /tmp/chainm.pid ] && kill -0 "$(cat /tmp/chainm.pid)" 2>/dev/null; then
  echo "=== chain N waiting on chain M pid $(cat /tmp/chainm.pid) $(date) ===" >> "$QL"
  tail --pid="$(cat /tmp/chainm.pid)" -f /dev/null
fi
echo "=== chain N starting $(date) ===" >> "$QL"

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

if run "$LOG/actbwd_check.log" 2400 python scripts/chip_check_actbwd.py; then
  echo "=== chain N: actbwd compile check OK $(date) ===" >> "$QL"
  TERRAIN_ACT_BWD=1 run "$LOG/actbwd_on.log" 2400 \
    python scripts/attr_bench.py full
  tail -1 "$LOG/actbwd_on.log" | grep '^{' | \
    sed 's/^{/{"tag": "actbwd_on", /' >> "$LOG/attr_results.jsonl" || true
  TERRAIN_ACT_BWD=1 TERRAIN_PALLAS_CONVS2=1 run "$LOG/actbwd_convs2_on.log" 2400 \
    python scripts/attr_bench.py full
  tail -1 "$LOG/actbwd_convs2_on.log" | grep '^{' | \
    sed 's/^{/{"tag": "actbwd_convs2_on", /' >> "$LOG/attr_results.jsonl" || true
else
  echo "=== chain N: actbwd compile check FAILED $(date) ===" >> "$QL"
fi
echo "=== chain N done $(date) ===" >> "$QL"
