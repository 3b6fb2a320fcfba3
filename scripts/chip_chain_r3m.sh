#!/bin/bash
# Round-3 chain M: 512px serve wire-encoding A/B, queued behind chain L.
#
# Measures scripts/bench_serve.py with --enc npy vs --enc png on the
# flagship two-stage 512px service (same harness as RESULTS_r3 §3b).
# Expectation to verify, not assume: the local closed-loop harness pays
# PNG's ~25-50 ms/frame single-core encode cost without enjoying the 7x
# byte savings (loopback is fast; the relay-fetch bound is device->host,
# upstream of encoding) — so png likely LOSES here while being the right
# default for remote clients.  Record both sides honestly.
set -u
cd /root/repo
LOG=/tmp/attr_r3
QL="$LOG/queue.log"
mkdir -p "$LOG"

if [ -f /tmp/chainl.pid ] && kill -0 "$(cat /tmp/chainl.pid)" 2>/dev/null; then
  echo "=== chain M waiting on chain L pid $(cat /tmp/chainl.pid) $(date) ===" >> "$QL"
  tail --pid="$(cat /tmp/chainl.pid)" -f /dev/null
fi
echo "=== chain M starting $(date) ===" >> "$QL"

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

export TERRAIN_DTYPE=bf16 TERRAIN_AOT=/tmp/aotm/store
for enc in npy png; do
  run "$LOG/serve512_$enc.log" 3600 python scripts/bench_serve.py \
    --experiment test1_nobn_bilin_both_stable --clients 4 --requests 40 \
    --max-batch 4 --enc "$enc"
  tail -1 "$LOG/serve512_$enc.log" | grep '^{' | \
    sed "s/^{/{\"tag\": \"serve512_$enc\", /" >> "$LOG/attr_results.jsonl" || true
done
echo "=== chain M done $(date) ===" >> "$QL"
