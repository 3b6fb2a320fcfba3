#!/bin/bash
# Round-3 chain K: chain J's probe-gated queue + the conv_s2 kernel
# validation/A/B inserted before the open-ended e1000 extension.
#
# Every arm is gated behind a bounded relay-liveness probe (backend init
# only, 180 s timeout, retried every 180 s) — the outage pattern is a
# hang at backend init, so un-gated arms burn their full timeout budgets
# against a dead relay and a timeout kill leaves no UNAVAILABLE marker to
# trigger retries.
#
# Queue (value order):
#   1. earth256_finetunep2p: resume e509 -> 600, then interp clip + gen
#      sheet (completes the real-data two-phase publication workflow)
#   2. bs=16 throughput point (is bs=8 the knee?)
#   3. AOT populate + true warm cold-start (fresh process, empty XLA
#      cache, populated store, v2 no-trace fingerprints)
#   4. conv_s2 kernel: real-Mosaic compile check (tiny shapes FIRST,
#      round-2 lesson), then the in-context A/B at current defaults vs
#      TERRAIN_PALLAS_CONVS2=1
#   5. device trace of the settled final config (re-ranks the round-4
#      roadmap; crashed in chain G on the outage)
#   6. extend earth256_stable 600 -> 1000 epochs (open-ended, last;
#      saves every 50 so a timeout still lands checkpoints)
set -u
cd /root/repo
LOG=/tmp/attr_r3
E2=/tmp/chipq_r3e
F=/tmp/chipq_r3f
QL="$LOG/queue.log"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
  echo "probe: relay live $(date)" >> "$QL"
}

# run <log> <timeout_s> <cmd...>: probe-gate, then one retry on failure.
run() {
  local log="$1" to="$2"; shift 2
  for attempt in 1 2; do
    probe
    timeout "$to" "$@" > "$log" 2>&1 && return 0
    echo "arm failed (attempt $attempt, $(date)): $*" >> "$QL"
    sleep 60
  done
  return 1
}

echo "=== chain K starting $(date) ===" >> "$QL"

export TERRAIN_DTYPE=bf16 TERRAIN_SCAN=15 TERRAIN_SWD=1 \
       TERRAIN_SAVE_EVERY=50 TERRAIN_RESUME=auto
run "$E2/train3.log" 2400 python -m terrain_tpu earth256_finetunep2p train
echo "=== chain K: finetune resume done $(date) ===" >> "$QL"
run "$E2/interp2.log" 2400 python -m terrain_tpu earth256_finetunep2p interp
run "$E2/gen2.log" 1800 python -m terrain_tpu earth256_finetunep2p gen
echo "=== chain K: finetune artifacts done $(date) ===" >> "$QL"
unset TERRAIN_SCAN TERRAIN_SWD TERRAIN_SAVE_EVERY TERRAIN_RESUME

BENCH_BS=16 BENCH_BEST_BS=0 BENCH_SCAN=0 run "$LOG/bench_bs16.json" 1200 \
  python bench.py
echo "=== chain K: bs16 done $(date) ===" >> "$QL"

run "$F/aot_populate3.log" 1800 python scripts/aot_coldstart.py \
  --aot /tmp/aotf/store --xla-cache /tmp/aotf/empty5
run "$F/aot_warm3.log" 1200 python scripts/aot_coldstart.py \
  --aot /tmp/aotf/store --xla-cache /tmp/aotf/empty6
echo "=== chain K: AOT arms done $(date) ===" >> "$QL"

# conv_s2: compile check gates the A/B; each full arm is 20 fenced steps
if run "$LOG/convs2_check.log" 2400 python scripts/chip_check_convs2.py; then
  echo "=== chain K: conv_s2 compile check OK $(date) ===" >> "$QL"
  run "$LOG/convs2_base.log" 2400 python scripts/attr_bench.py full
  tail -1 "$LOG/convs2_base.log" | grep '^{' | \
    sed 's/^{/{"tag": "convs2_off", /' >> "$LOG/attr_results.jsonl" || true
  TERRAIN_PALLAS_CONVS2=1 run "$LOG/convs2_on.log" 2400 \
    python scripts/attr_bench.py full
  tail -1 "$LOG/convs2_on.log" | grep '^{' | \
    sed 's/^{/{"tag": "convs2_on", /' >> "$LOG/attr_results.jsonl" || true
else
  echo "=== chain K: conv_s2 compile check FAILED $(date) ===" >> "$QL"
fi
echo "=== chain K: conv_s2 arms done $(date) ===" >> "$QL"

rm -rf /tmp/terrain_trace_final
probe
TERRAIN_PROFILE=/tmp/terrain_trace_final timeout 2400 \
  python scripts/attr_bench.py profile > "$LOG/attr_profile_final.log" 2>&1
tail -1 "$LOG/attr_profile_final.log" | grep '^{' | \
  sed 's/^{/{"tag": "profile_final", /' >> "$LOG/attr_results.jsonl" || true
echo "=== chain K: final profile done $(date) ===" >> "$QL"

export TERRAIN_DTYPE=bf16 TERRAIN_SWD=1 TERRAIN_EPOCHS=1000 \
       TERRAIN_RESUME=auto TERRAIN_SAVE_EVERY=50
probe
timeout 7200 python -m terrain_tpu earth256_stable train \
  > "$E2/extend1000.log" 2>&1
echo "=== chain K done $(date) ===" >> "$QL"
