#!/bin/bash
# Sequential attribution queue (round 3).  One TPU process at a time;
# each variant appends its one-line JSON to $OUT.
#
# Two measurement families:
#   - legacy-consistent (TERRAIN_AUGMENT=gather): completes the subtraction
#     table started with the old single-gather augmentation (full=99.06,
#     noaug=70.5, gather=32.69 were measured with it)
#   - candidate product config (shear augment default, then + scan):
#     measures the round-3 optimizations end-to-end
set -u
cd /root/repo
LOG=/tmp/attr_r3
OUT=$LOG/attr_results.jsonl
mkdir -p "$LOG"

run_variant () {  # $1 variant, $2 tag, env comes from caller
  echo "=== attr $2 $(date) ===" >> "$LOG/queue.log"
  timeout 1800 python scripts/attr_bench.py "$1" > "$LOG/attr_$2.log" 2>&1
  tail -1 "$LOG/attr_$2.log" | grep '^{' | sed "s/^{/{\"tag\": \"$2\", /" >> "$OUT" || \
    echo "{\"tag\": \"$2\", \"variant\": \"$1\", \"error\": true}" >> "$OUT"
}

# candidate config first (the actionable numbers)
run_variant full  full_shear
run_variant scan  scan_shear
run_variant noaug noaug_new

# legacy-consistent completions of the subtraction table
export TERRAIN_AUGMENT=gather
run_variant fwd   fwd_gather
run_variant noopt noopt_gather
run_variant flops flops
unset TERRAIN_AUGMENT

# profiler attempt last (best effort)
run_variant profile profile

echo "attr queue done at $(date)" >> "$LOG/queue.log"
