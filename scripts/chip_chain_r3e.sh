#!/bin/bash
# Round-3 chain E: the reference's two-phase publication workflow on REAL
# NASA data (earth256): freeze the earth256_stable DCGAN -> fine-tune the
# p2p stage -> 100-sample interp clip + gen sheet.  Runs after chain D
# frees the chip.
set -u
cd /root/repo
LOG=/tmp/chipq_r3e
mkdir -p "$LOG"

PID=$(cat /tmp/chaind.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
echo "chain E starting at $(date) " > "$LOG/queue.log"

export TERRAIN_DTYPE=bf16 TERRAIN_SCAN=15 TERRAIN_SWD=1 TERRAIN_SAVE_EVERY=50
timeout 7200 python -m terrain_tpu earth256_finetunep2p train \
  > "$LOG/train.log" 2>&1
echo "finetune train done at $(date)" >> "$LOG/queue.log"

timeout 3600 python -m terrain_tpu earth256_finetunep2p interp \
  > "$LOG/interp.log" 2>&1
echo "interp done at $(date)" >> "$LOG/queue.log"

timeout 3600 python -m terrain_tpu earth256_finetunep2p gen \
  > "$LOG/gen.log" 2>&1
echo "chain E done at $(date)" >> "$LOG/queue.log"
