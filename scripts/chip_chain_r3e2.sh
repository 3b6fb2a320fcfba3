#!/bin/bash
# Round-3 chain E2: resume + finish the earth256 finetune that chain E
# lost to a hung relay RPC at ~e510 (process futex-parked for 80 min; the
# run itself was healthy — checkpoints through 500.model).  Resumes from
# the latest checkpoint, then renders the interp clip + gen sheet.
set -u
cd /root/repo
LOG=/tmp/chipq_r3e
mkdir -p "$LOG"

for PID in 7059 7055; do
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
done
echo "chain E2 starting at $(date)" >> "$LOG/queue.log"

export TERRAIN_DTYPE=bf16 TERRAIN_SCAN=15 TERRAIN_SWD=1 \
       TERRAIN_SAVE_EVERY=50 TERRAIN_RESUME=auto
timeout 3600 python -m terrain_tpu earth256_finetunep2p train \
  > "$LOG/train2.log" 2>&1
echo "finetune resume done at $(date)" >> "$LOG/queue.log"

timeout 3600 python -m terrain_tpu earth256_finetunep2p interp \
  > "$LOG/interp.log" 2>&1
echo "interp done at $(date)" >> "$LOG/queue.log"

timeout 3600 python -m terrain_tpu earth256_finetunep2p gen \
  > "$LOG/gen.log" 2>&1
echo "chain E2 done at $(date)" >> "$LOG/queue.log"
