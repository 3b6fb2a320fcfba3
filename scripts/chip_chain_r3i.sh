#!/bin/bash
# Round-3 chain I: re-sequenced tail of the round-3 chip queue.
#
# Context: the 19:10-21:44 relay outage silently failed chain F (both AOT
# arms — /tmp/aotf/store was never populated) and chain E2's three arms
# (finetune resume stopped at e509/600, no interp clip, no gen sheet),
# while the queue logs read "done".  Chains G/H also had the open-ended
# e1000 extension sequenced FIRST, risking a collision with the driver's
# end-of-round bench.py on the single chip.
#
# This chain re-runs the failed arms in value order, each with a bounded
# timeout and one retry (the outage pattern is hang-~25-min-then-
# UNAVAILABLE, so a retry after a crash often lands on a recovered relay):
#   0. wait for the in-flight final-config device profile (chain G arm 1)
#   1. earth256_finetunep2p: resume e509 -> 600 (completes the real-data
#      two-phase publication workflow), then interp clip + gen sheet
#   2. bs=16 throughput point
#   3. AOT populate then true warm cold-start (fresh process, empty XLA
#      cache, populated store)
#   4. extend earth256_stable 600 -> 1000 epochs (exact resume; saves
#      every 50, so a timeout mid-run still lands checkpoints)
set -u
cd /root/repo
LOG=/tmp/attr_r3
E2=/tmp/chipq_r3e
F=/tmp/chipq_r3f

# run <log> <timeout_s> <cmd...>: one retry if the log shows the
# UNAVAILABLE backend crash (or the command failed with no output).
run() {
  local log="$1" to="$2"; shift 2
  for attempt in 1 2; do
    timeout "$to" "$@" > "$log" 2>&1 && return 0
    grep -q "UNAVAILABLE" "$log" || return 1
    echo "retry ($attempt) after UNAVAILABLE: $* $(date)" >> "$LOG/queue.log"
    sleep 120
  done
  return 1
}

while kill -0 11993 2>/dev/null; do sleep 30; done
echo "=== chain I: profile done $(date) ===" >> "$LOG/queue.log"
tail -1 "$LOG/attr_profile_final.log" | grep '^{' | \
  sed 's/^{/{"tag": "profile_final", /' >> "$LOG/attr_results.jsonl" || true

export TERRAIN_DTYPE=bf16 TERRAIN_SCAN=15 TERRAIN_SWD=1 \
       TERRAIN_SAVE_EVERY=50 TERRAIN_RESUME=auto
run "$E2/train3.log" 2400 python -m terrain_tpu earth256_finetunep2p train
echo "=== chain I: finetune resume done $(date) ===" >> "$LOG/queue.log"
run "$E2/interp2.log" 2400 python -m terrain_tpu earth256_finetunep2p interp
run "$E2/gen2.log" 1800 python -m terrain_tpu earth256_finetunep2p gen
echo "=== chain I: finetune artifacts done $(date) ===" >> "$LOG/queue.log"
unset TERRAIN_SCAN TERRAIN_SWD TERRAIN_SAVE_EVERY TERRAIN_RESUME

BENCH_BS=16 BENCH_BEST_BS=0 run "$LOG/bench_bs16.json" 1200 python bench.py
echo "=== chain I: bs16 done $(date) ===" >> "$LOG/queue.log"

run "$F/aot_populate3.log" 1800 python scripts/aot_coldstart.py \
  --aot /tmp/aotf/store --xla-cache /tmp/aotf/empty3
run "$F/aot_warm3.log" 1200 python scripts/aot_coldstart.py \
  --aot /tmp/aotf/store --xla-cache /tmp/aotf/empty4
echo "=== chain I: AOT arms done $(date) ===" >> "$LOG/queue.log"

export TERRAIN_DTYPE=bf16 TERRAIN_SWD=1 TERRAIN_EPOCHS=1000 \
       TERRAIN_RESUME=auto TERRAIN_SAVE_EVERY=50
timeout 2400 python -m terrain_tpu earth256_stable train \
  > "$E2/extend1000.log" 2>&1
echo "=== chain I done $(date) ===" >> "$LOG/queue.log"
