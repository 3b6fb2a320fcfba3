#!/bin/bash
# Round-3 chain P: consolidated re-run of the arms lost to the SECOND host
# re-provision (chain O2's matrix remainder + all of chain O3).
#
# Arms, in order:
#   1. actbwd_on   — TERRAIN_ACT_BWD=1 alone (isolate the fused dW select)
#   2. s2thin_on   — CONVS2+THIN without ACT_BWD (isolate the interaction
#                    that made all_on 64.6 lose to thin_on 63.4)
#   3. r3p_base    — replicate for the fresh-host noise floor
#   4. bench_gen   — two-stage 512px sampler: compute vs delivered imgs/s
#   5. bench.py    — headline re-measure with whatever defaults are in the
#                    tree by then (the default flip lands between 3 and 5)
#
# Results are appended to $LOG/attr_results.jsonl; mirror into
# docs/artifacts_r3/attr/ and commit PROMPTLY after each arm (CLAUDE.md
# re-provision trap).
set -u
cd /root/repo
LOG=/tmp/chipp
QL="$LOG/queue.log"
mkdir -p "$LOG"
echo "=== chain P starting $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
  echo "probe: relay live $(date)" >> "$QL"
}

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

export TERRAIN_DTYPE=bf16

tagit() {
  tail -1 "$1" | grep '^{' | sed "s/^{/{\"tag\": \"$2\", /" \
    >> "$LOG/attr_results.jsonl" || true
}

TERRAIN_ACT_BWD=1 run "$LOG/actbwd_on.log" 3000 python scripts/attr_bench.py full
tagit "$LOG/actbwd_on.log" actbwd_on
echo "=== arm actbwd_on done $(date) ===" >> "$QL"

TERRAIN_PALLAS_CONVS2=1 TERRAIN_PALLAS_THIN=1 run "$LOG/s2thin_on.log" 3000 \
  python scripts/attr_bench.py full
tagit "$LOG/s2thin_on.log" s2thin_on
echo "=== arm s2thin_on done $(date) ===" >> "$QL"

# Base = stem+decoder WITHOUT conv_thin: after the chain-P default flip
# conv_thin is ON by default, so the base arm must opt out explicitly or a
# re-provision re-run would append a mis-tagged row (ADVICE r3).
TERRAIN_PALLAS_THIN=0 run "$LOG/base.log" 3000 python scripts/attr_bench.py full
tagit "$LOG/base.log" r3p_base
echo "=== arm r3p_base done $(date) ===" >> "$QL"

run "$LOG/bench_gen.log" 3600 python scripts/bench_gen.py --bs 4 8
echo "=== arm bench_gen done $(date) ===" >> "$QL"

run "$LOG/bench_headline.log" 3600 python bench.py
echo "=== chain P done $(date) ===" >> "$QL"
