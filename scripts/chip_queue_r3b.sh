#!/bin/bash
# Round-3 chip queue, part B: runs after the attribution queue finishes.
# Stages: 512px finetune publication workflow (VERDICT item 5), AOT
# cold-start A/B (item 6), 512px serving benchmark (item 7).
set -u
cd /root/repo
LOG=/tmp/chipq_r3b
mkdir -p "$LOG"

PID=$(cat /tmp/attrq.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
echo "attr queue done, part B starting at $(date)" > "$LOG/queue.log"

# 0. decomposition matrix for the round-3 op rewrites: full_r3ops measured
#    76.9 ms vs 69.8 before the dense-resize/pool changes, so each change
#    gets an isolating arm (plus the stem-activation fusion, new since the
#    r3ops arms compiled).  Defaults everywhere else.
attr_arm () {  # $1 tag, rest: env pairs
  local tag="$1"; shift
  echo "=== attr $tag $(date) ===" >> /tmp/attr_r3/queue.log
  ( for kv in "$@"; do export "${kv?}"; done
    timeout 2400 python scripts/attr_bench.py full \
      > "/tmp/attr_r3/attr_$tag.log" 2>&1 )
  tail -1 "/tmp/attr_r3/attr_$tag.log" | grep '^{' | \
    sed "s/^{/{\"tag\": \"$tag\", /" >> /tmp/attr_r3/attr_results.jsonl || \
    echo "{\"tag\": \"$tag\", \"error\": true}" >> /tmp/attr_r3/attr_results.jsonl
}
attr_arm full_r3stem                                  # everything new
attr_arm r3_poolsas   TERRAIN_POOL_VJP=sas            # minus pool VJP
attr_arm r3_resizexla TERRAIN_RESIZE=xla              # minus dense resize
attr_arm r3_bcxla     TERRAIN_BC_BWD=xla32            # minus bf16 dense adjoint
echo "decomposition matrix measured at $(date)" >> "$LOG/queue.log"

# 1. freeze stable DCGAN -> fine-tune p2p with bilinear decoder, 600 epochs
#    on the same fBm data the DCGAN was trained on (reference
#    experiments.py:58-92 workflow).
export TERRAIN_SYNTHETIC=1 TERRAIN_FAST=1 TERRAIN_DTYPE=bf16 TERRAIN_SCAN=15
TERRAIN_EPOCHS=600 TERRAIN_SAVE_EVERY=50 TERRAIN_SWD=1 \
  timeout 14400 python -m terrain_tpu test1_nobn_finetunep2p_bilin train \
  > "$LOG/finetune_train.log" 2>&1
echo "finetune train done at $(date)" >> "$LOG/queue.log"

# 2. the publication artifact: 100-sample two-stage interp clip
timeout 7200 python -m terrain_tpu test1_nobn_finetunep2p_bilin interp \
  > "$LOG/finetune_interp.log" 2>&1
echo "finetune interp done at $(date)" >> "$LOG/queue.log"

# 3. AOT cold-start A/B (fresh process each; empty XLA caches)
rm -rf /tmp/aotcs
timeout 1800 python scripts/aot_coldstart.py --aot /tmp/aotcs/store \
  --xla-cache /tmp/aotcs/x1 > "$LOG/aot_populate.log" 2>&1
timeout 1800 python scripts/aot_coldstart.py --aot /tmp/aotcs/store \
  --xla-cache /tmp/aotcs/x2 > "$LOG/aot_warm.log" 2>&1
timeout 1800 python scripts/aot_coldstart.py \
  --xla-cache /tmp/aotcs/x3 > "$LOG/aot_baseline.log" 2>&1
echo "aot coldstart done at $(date)" >> "$LOG/queue.log"

# 4. 512px serving benchmark (flagship two-stage model, random weights)
unset TERRAIN_SYNTHETIC TERRAIN_FAST
timeout 3600 python scripts/bench_serve.py \
  --experiment test1_nobn_bilin_both_stable --clients 4 --requests 40 \
  --max-batch 4 > "$LOG/serve512.log" 2>&1
echo "queue B done at $(date)" >> "$LOG/queue.log"
