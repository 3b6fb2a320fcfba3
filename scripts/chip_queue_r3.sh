#!/bin/bash
# Round-3 chip work queue: runs after the earth256_stable 600-epoch train
# finishes (one TPU process at a time on this relay).  Each stage logs to
# $LOG/<stage>.log; failures don't stop later stages.
set -u
cd /root/repo
LOG=/tmp/chipq_r3
mkdir -p "$LOG"

PID=$(cat /tmp/earth256.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
echo "earth256 train done at $(date)" > "$LOG/queue.log"

# 1. earth256 artifacts: 100-sample gen sheet + interpolation clip
timeout 3600 python -m terrain_tpu earth256_stable gen    > "$LOG/earth_gen.log" 2>&1
timeout 3600 python -m terrain_tpu earth256_stable interp > "$LOG/earth_interp.log" 2>&1
python tools/summarize_run.py output/earth256_stable      > "$LOG/earth_summary.log" 2>&1

# 2. in-context cost attribution for the 512px flagship step
for v in full noaug gather fwd noopt flops profile; do
  echo "=== attr $v $(date) ===" >> "$LOG/queue.log"
  timeout 1800 python scripts/attr_bench.py "$v" > "$LOG/attr_$v.log" 2>&1
done
echo "queue done at $(date)" >> "$LOG/queue.log"
