#!/bin/bash
# Round-3 chain G: final-config depth with the remaining chip time.
#  1. device trace of the settled 65.8 ms step (re-ranks what's left for
#     the round-4 roadmap)
#  2. bs=16 throughput point (is bs=8 the knee?)
#  3. extend earth256_stable 600 -> 1000 epochs via exact resume — the
#     reference trained to e1000 (its README compares e~593 vs e1000)
set -u
cd /root/repo
LOG=/tmp/attr_r3

PID=$(cat /tmp/chaine2.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
echo "=== chain G starting $(date) ===" >> "$LOG/queue.log"

rm -rf /tmp/terrain_trace_final
TERRAIN_PROFILE=/tmp/terrain_trace_final timeout 2400 \
  python scripts/attr_bench.py profile > "$LOG/attr_profile_final.log" 2>&1
tail -1 "$LOG/attr_profile_final.log" | grep '^{' | \
  sed 's/^{/{"tag": "profile_final", /' >> "$LOG/attr_results.jsonl" || true

BENCH_BS=16 BENCH_BEST_BS=0 timeout 2400 python bench.py \
  > "$LOG/bench_bs16.json" 2> "$LOG/bench_bs16.log" || true

export TERRAIN_DTYPE=bf16 TERRAIN_SWD=1 TERRAIN_EPOCHS=1000 \
       TERRAIN_RESUME=auto TERRAIN_SAVE_EVERY=50
timeout 7200 python -m terrain_tpu earth256_stable train \
  > /tmp/chipq_r3e/extend1000.log 2>&1
echo "chain G done at $(date)" >> "$LOG/queue.log"
