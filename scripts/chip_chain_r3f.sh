#!/bin/bash
# Round-3 chain F: clean AOT cold-start re-measurement with the shape-key
# fingerprints (no load-time trace).  The first pass populates the store
# reusing part-B's warm XLA cache (so the compile itself is cheap); the
# second is the honest cold start: fresh process, EMPTY XLA cache, only
# the AOT store present.  Runs after chain E; keep the host otherwise idle
# (the part-B arms were contaminated by concurrent CPU load).
set -u
cd /root/repo
LOG=/tmp/chipq_r3f
mkdir -p "$LOG"

PID=$(cat /tmp/chaine.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
echo "chain F starting at $(date)" > "$LOG/queue.log"

rm -rf /tmp/aotf
timeout 1800 python scripts/aot_coldstart.py --aot /tmp/aotf/store \
  --xla-cache /tmp/aotcs/x1 > "$LOG/aot_populate2.log" 2>&1
timeout 1800 python scripts/aot_coldstart.py --aot /tmp/aotf/store \
  --xla-cache /tmp/aotf/empty > "$LOG/aot_warm2.log" 2>&1
echo "chain F done at $(date)" >> "$LOG/queue.log"
