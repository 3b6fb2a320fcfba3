#!/bin/bash
# Round-3 chain H: the true AOT warm cold-start measurement.  Chain F's
# first arm hit a transient backend outage (relay session lock after a
# killed client), so its second arm became the store populator; this chain
# runs the actual measurement: fresh process, EMPTY XLA cache, populated
# /tmp/aotf/store with the v2 (no-trace) fingerprints.
set -u
cd /root/repo
LOG=/tmp/chipq_r3f

PID=$(cat /tmp/chaing2.pid 2>/dev/null || echo 11137)
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "chain H starting at $(date)" >> "$LOG/queue.log"

timeout 1800 python scripts/aot_coldstart.py --aot /tmp/aotf/store \
  --xla-cache /tmp/aotf/empty2 > "$LOG/aot_warm3.log" 2>&1
echo "chain H done at $(date)" >> "$LOG/queue.log"
