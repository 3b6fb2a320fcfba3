#!/bin/bash
# Round-5 chain A: attack the two largest attackable trace lines on top of
# the shipped bc6 defaults (VERDICT items 2 and 4):
#   TERRAIN_POOL_VJP=lanes    max-pool backward with every pairing op off
#                             the tiled dims (ops/pool.py) — vs the ~6.4 ms
#                             pool fwd+bwd select-and-scatter line
#   TERRAIN_STEM_PLANES=bf16  stem plane stack stored bf16 (exact for bf16
#                             inputs) — vs the ~4.5 ms boundary-stack line
# plus the bs=8 composition matrix on bc6 (s2 / ACT_BWD / stem tile) that
# round 4 left without arms.  Every arm is resumable (skipped if its tag
# already landed in the artifact jsonl) and commits incrementally.
set -u
cd /root/repo
LOG=/tmp/chipr5a
ART=docs/artifacts_r5/attr
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART"
echo "=== chain R5A starting $(date) ===" >> "$QL"

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
  git commit -q -m "r5 chain A: $1" -- "$ART" >/dev/null 2>&1 || true
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

# ---- Phase A: bs4 singles + pair (shipped defaults now include bc6) ----
attr_arm bs4_r5base 4
attr_arm bs4_poollanes 4 TERRAIN_POOL_VJP=lanes
attr_arm bs4_stemplanes 4 TERRAIN_STEM_PLANES=bf16
attr_arm bs4_lanes_stemplanes 4 TERRAIN_POOL_VJP=lanes TERRAIN_STEM_PLANES=bf16

# ---- Phase B: bs8 matrix on bc6 (VERDICT item 4; conv_thin auto-gated) ----
attr_arm bs8_r5base 8
attr_arm bs8_poollanes 8 TERRAIN_POOL_VJP=lanes
attr_arm bs8_stemplanes 8 TERRAIN_STEM_PLANES=bf16
attr_arm bs8_lanes_stemplanes 8 TERRAIN_POOL_VJP=lanes TERRAIN_STEM_PLANES=bf16
attr_arm bs8_s2 8 TERRAIN_PALLAS_CONVS2=1
attr_arm bs8_actbwd 8 TERRAIN_ACT_BWD=1
attr_arm bs8_stem8 8 TERRAIN_STEM_TH=8

# ---- Phase C: trace under the measured-best bs4 composition ----
BEST=$(python - <<'EOF'
import json
rows = {}
for ln in open("docs/artifacts_r5/attr/attr_results.jsonl"):
    d = json.loads(ln)
    if "step_ms" in d and d["tag"].startswith("bs4_"):
        rows[d["tag"]] = d["step_ms"]
print(min(rows, key=rows.get) if rows else "bs4_r5base")
EOF
)
echo "=== best bs4 composition: $BEST $(date) ===" >> "$QL"
if [ ! -f "$ART/trace_r5best.csv" ]; then
  rm -rf /tmp/trace_r5best
  ( case "$BEST" in
      bs4_poollanes) export TERRAIN_POOL_VJP=lanes ;;
      bs4_stemplanes) export TERRAIN_STEM_PLANES=bf16 ;;
      bs4_lanes_stemplanes) export TERRAIN_POOL_VJP=lanes TERRAIN_STEM_PLANES=bf16 ;;
    esac
    probe
    TERRAIN_PROFILE=/tmp/trace_r5best timeout 2400 \
      python scripts/attr_bench.py profile > "$LOG/profile_r5best.log" 2>&1 )
  tj=$(find /tmp/trace_r5best -name "*.trace.json.gz" 2>/dev/null | head -1)
  if [ -n "$tj" ]; then
    python tools/summarize_trace.py "$tj" --csv "$ART/trace_r5best.csv" \
      > "$ART/trace_r5best_summary.txt" 2>&1 || true
    echo "trace composition: $BEST" >> "$ART/trace_r5best_summary.txt"
    git add "$ART" >/dev/null 2>&1 || true
    git commit -q -m "r5 chain A: device trace under best bs4 composition" \
      -- "$ART" >/dev/null 2>&1 || true
  fi
fi
echo "=== chain R5A done $(date) ===" >> "$QL"
