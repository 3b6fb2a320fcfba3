#!/bin/bash
# Round-3 chain C: after the in-flight attr run, measure the round-3 ops
# rewrites end-to-end (dense resize adjoint + max-pool VJP + shear augment)
# with the Pallas conv kernels ON vs OFF — the trace-driven decision on
# whether the kernels keep their default-on dispatch — then hand off to
# part B (finetune-512 / AOT / serve).
set -u
cd /root/repo
LOG=/tmp/attr_r3
OUT=$LOG/attr_results.jsonl

PID=$(cat /tmp/attrq.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi

run_variant () {  # $1 variant, $2 tag
  echo "=== attr $2 $(date) ===" >> "$LOG/queue.log"
  timeout 2400 python scripts/attr_bench.py "$1" > "$LOG/attr_$2.log" 2>&1
  tail -1 "$LOG/attr_$2.log" | grep '^{' | sed "s/^{/{\"tag\": \"$2\", /" >> "$OUT" || \
    echo "{\"tag\": \"$2\", \"variant\": \"$1\", \"error\": true}" >> "$OUT"
}

run_variant full full_r3ops
( export TERRAIN_PALLAS_CONV=0
  run_variant full full_r3ops_nopallas )
run_variant scan scan_r3ops

echo "chain C measurements done at $(date)" >> "$LOG/queue.log"
exec bash scripts/chip_queue_r3b.sh
