#!/bin/bash
# Round-3 chain D: after part B (finetune/AOT/serve) frees the chip,
# confirm the settled op defaults end-to-end and capture the round's
# bench numbers (parity bs=4 + best bs=8 + MFU).
set -u
cd /root/repo
LOG=/tmp/attr_r3

PID=$(cat /tmp/chainc.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
echo "=== chain D starting $(date) ===" >> "$LOG/queue.log"

# 1. confirmation: full step at the final defaults
timeout 2400 python scripts/attr_bench.py full > "$LOG/attr_r3_final.log" 2>&1
tail -1 "$LOG/attr_r3_final.log" | grep '^{' | \
  sed 's/^{/{"tag": "r3_final", /' >> "$LOG/attr_results.jsonl" || \
  echo '{"tag": "r3_final", "error": true}' >> "$LOG/attr_results.jsonl"

# 2. scan superstep at the final defaults (the product TERRAIN_SCAN path)
timeout 2400 python scripts/attr_bench.py scan > "$LOG/attr_r3_final_scan.log" 2>&1
tail -1 "$LOG/attr_r3_final_scan.log" | grep '^{' | \
  sed 's/^{/{"tag": "r3_final_scan", /' >> "$LOG/attr_results.jsonl" || \
  echo '{"tag": "r3_final_scan", "error": true}' >> "$LOG/attr_results.jsonl"

# 3. the driver-style bench (bs=4 parity + bs=8 best + MFU)
timeout 3600 python bench.py > "$LOG/bench_r3.json" 2> "$LOG/bench_r3.log"
echo "chain D done at $(date)" >> "$LOG/queue.log"
