#!/bin/bash
# Round-4 chain F: in-context chip A/B of the combined-conv backward
# rewrites built from the chain-D trace diff (docs/RESULTS_r4.md 4a):
#   TERRAIN_BC_BWD=conv6       decoder bilinear+conv dx as ONE stride-2
#                              6x6 conv (replaces ~5.4 ms/step of
#                              interleave-adjoint work at fused.py:104)
#   TERRAIN_NEAREST_BWD=conv   DCGAN-gen fused upsample-conv dx as one
#                              stride-2 (k+1)-tap conv (replaces the
#                              space-to-depth in its backward)
#   TERRAIN_DECONV_BWD=conv    deconv2x2 dx as a stride-2 2x2 VALID conv
# All exact (tests/test_fused.py, tests/test_pallas.py); every arm runs
# the shipped defaults + the knob(s) — compositions measured, not knobs
# (round-3 lesson).  Base for comparison: bs4_default_r4 (chain D phase Z).
set -u
cd /root/repo
LOG=/tmp/chipr4f
ART=docs/artifacts_r4/attr
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART"
echo "=== chain R4F starting $(date) ===" >> "$QL"

EPID=$(cat /tmp/chipr4e.pid 2>/dev/null || echo "")
if [ -n "$EPID" ]; then
  while kill -0 "$EPID" 2>/dev/null; do sleep 60; done
fi
echo "=== chain E exited $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
}

tagit() {
  local line
  line=$(tail -1 "$1" | grep '^{' || true)
  if [ -n "$line" ]; then
    echo "$line" | sed "s/^{/{\"tag\": \"$2\", /" >> "$LOG/attr_results.jsonl"
  else
    echo "{\"tag\": \"$2\", \"error\": true}" >> "$LOG/attr_results.jsonl"
  fi
}

land_jsonl() {
  python tools/land_chip_results.py "$LOG/attr_results.jsonl" \
    "$ART/attr_results.jsonl" >/dev/null 2>&1 || true
  git add "$ART" >/dev/null 2>&1 || true
  git commit -q -m "r4 chain F: $1" -- "$ART" >/dev/null 2>&1 || true
}

attr_arm() {
  local tag="$1" bs="$2"; shift 2
  grep -q "\"tag\": \"$tag\"" "$ART/attr_results.jsonl" 2>/dev/null && return 0
  ( for kv in "$@"; do export "${kv?}"; done
    probe
    timeout 3000 python scripts/attr_bench.py full --bs "$bs" \
      > "$LOG/attr_$tag.log" 2>&1 )
  tagit "$LOG/attr_$tag.log" "$tag"
  land_jsonl "arm $tag"
  echo "=== attr $tag done $(date) ===" >> "$QL"
}

export TERRAIN_DTYPE=bf16

# singles (each = shipped defaults + one knob)
attr_arm bs4_bc6 4 TERRAIN_BC_BWD=conv6
attr_arm bs4_nearestbwd 4 TERRAIN_NEAREST_BWD=conv
attr_arm bs4_deconvbwd 4 TERRAIN_DECONV_BWD=conv
# pairs + all (composition is what ships, not the union of wins)
attr_arm bs4_bc6_nearest 4 TERRAIN_BC_BWD=conv6 TERRAIN_NEAREST_BWD=conv
attr_arm bs4_newbwd_all 4 TERRAIN_BC_BWD=conv6 TERRAIN_NEAREST_BWD=conv \
  TERRAIN_DECONV_BWD=conv
attr_arm bs8_newbwd_all 8 TERRAIN_BC_BWD=conv6 TERRAIN_NEAREST_BWD=conv \
  TERRAIN_DECONV_BWD=conv
# all + the leaky save-scale VJP (chain D phase X measures leaky alone)
attr_arm bs4_newbwd_leaky 4 TERRAIN_BC_BWD=conv6 TERRAIN_NEAREST_BWD=conv \
  TERRAIN_DECONV_BWD=conv TERRAIN_LEAKY_MUL=1
echo "=== chain R4F done $(date) ===" >> "$QL"
