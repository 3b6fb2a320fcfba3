#!/bin/bash
# Sequential attribution queue (round 3).  One TPU process at a time;
# each variant appends its one-line JSON to $OUT.
set -u
cd /root/repo
LOG=/tmp/attr_r3
OUT=$LOG/attr_results.jsonl
mkdir -p "$LOG"
: > "$OUT"
for v in full noaug gather fwd noopt dcgan p2p flops profile; do
  echo "=== attr $v $(date) ===" >> "$LOG/queue.log"
  timeout 1800 python scripts/attr_bench.py "$v" > "$LOG/attr_$v.log" 2>&1
  tail -1 "$LOG/attr_$v.log" | grep '^{' >> "$OUT" || \
    echo "{\"variant\": \"$v\", \"error\": true}" >> "$OUT"
done
echo "attr queue done at $(date)" >> "$LOG/queue.log"
