#!/bin/bash
# Round-3 chain O2: ACT_BWD retry after the bf16-cmpf Mosaic fix.
#
# Chain O's actbwd compile check failed on real Mosaic with "Target does
# not support this comparison" — arith.cmpf on packed bf16 vectors (the
# fused dW select compared the saved bf16 output against 0 directly).
# The kernels now compare in f32; this chain re-checks and runs the
# skipped actbwd_on A/B arm.  Queued behind chain O's pid.
set -u
cd /root/repo
LOG=/tmp/chipo
QL="$LOG/queue.log"
mkdir -p "$LOG"

if [ -f /tmp/chaino.pid ] && kill -0 "$(cat /tmp/chaino.pid)" 2>/dev/null; then
  echo "=== chain O2 waiting on chain O pid $(cat /tmp/chaino.pid) $(date) ===" >> "$QL"
  tail --pid="$(cat /tmp/chaino.pid)" -f /dev/null
fi
echo "=== chain O2 starting $(date) ===" >> "$QL"

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

tagit() {
  tail -1 "$1" | grep '^{' | sed "s/^{/{\"tag\": \"$2\", /" \
    >> "$LOG/attr_results.jsonl" || true
}

if run "$LOG/actbwd_check2.log" 2400 python scripts/chip_check_actbwd.py; then
  echo "=== chain O2: actbwd compile check OK $(date) ===" >> "$QL"
  TERRAIN_ACT_BWD=1 run "$LOG/actbwd_on.log" 3000 \
    python scripts/attr_bench.py full
  tagit "$LOG/actbwd_on.log" actbwd_on
else
  echo "=== chain O2: actbwd compile check FAILED $(date) ===" >> "$QL"
fi

# fill in the A/B matrix: convs2+thin without actbwd (all_on at 64.6 ms
# lost to thin_on's 63.4 — isolate whether ACT_BWD or the s2+thin
# interaction costs the ~1 ms), plus a base replicate for the noise floor
TERRAIN_PALLAS_CONVS2=1 TERRAIN_PALLAS_THIN=1 run "$LOG/s2thin_on.log" 3000 \
  python scripts/attr_bench.py full
tagit "$LOG/s2thin_on.log" s2thin_on
run "$LOG/base2.log" 3000 python scripts/attr_bench.py full
tagit "$LOG/base2.log" r3o_base2
echo "=== chain O2 done $(date) ===" >> "$QL"
