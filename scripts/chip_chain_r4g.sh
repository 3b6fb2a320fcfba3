#!/bin/bash
# Round-4 chain G: settle the TERRAIN_BC_BWD=conv6 default flip.
# Chain F measured bc6 ALONE as the winning composition at bs=4
# (61.35 vs 64.94 ms base); before flipping the default (the round-3
# lesson: no flip without a quality trajectory through the new path),
# this chain
#   1. replicates the winner same-day (bs4_bc6_rep),
#   2. fills the two matrix holes: bs8_bc6 (batch gating) and
#      bs4_bc6_deconv (the one unmeasured pair of chain-F winners),
#   3. picks the measured-best composition mechanically from the jsonl,
#   4. runs the REQUIRED 600-epoch 512px both-mode trajectory through it
#      (same recipe as docs/artifacts_r4/stable512_shipped; identical
#      seeds), landing artifacts incrementally,
#   5. warms bench.py under the winning knobs (tag bench_r4_bc6) so the
#      driver's end-of-round bench hits a warm cache after the flip.
set -u
cd /root/repo
LOG=/tmp/chipr4g
ART=docs/artifacts_r4/attr
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART"
echo "=== chain R4G starting $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
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
  git commit -q -m "r4 chain G: $1" -- "$ART" >/dev/null 2>&1 || true
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

# ---- Phase A: replicate + matrix holes ----
attr_arm bs4_bc6_rep 4 TERRAIN_BC_BWD=conv6
attr_arm bs8_bc6 8 TERRAIN_BC_BWD=conv6
attr_arm bs4_bc6_deconv 4 TERRAIN_BC_BWD=conv6 TERRAIN_DECONV_BWD=conv

# ---- Phase B: mechanical composition decision ----
# bc6 is in (replicated winner); deconv joins only if the measured PAIR
# beats bc6-alone by >0.5 ms (same-day rep as the bc6-alone figure).
PAIR_WINS=$(python - <<'EOF'
import json
rows = {}
for ln in open("docs/artifacts_r4/attr/attr_results.jsonl"):
    d = json.loads(ln)
    if "step_ms" in d:
        rows[d["tag"]] = d["step_ms"]
bc6 = rows.get("bs4_bc6_rep", rows.get("bs4_bc6", 99))
pair = rows.get("bs4_bc6_deconv", 999)
print(1 if pair < bc6 - 0.5 else 0)
EOF
)
if [ "$PAIR_WINS" = "1" ]; then
  WIN_KNOBS=(TERRAIN_BC_BWD=conv6 TERRAIN_DECONV_BWD=conv)
  WIN_TAG=bc6_deconv
else
  WIN_KNOBS=(TERRAIN_BC_BWD=conv6)
  WIN_TAG=bc6
fi
echo "=== decision: winning composition = $WIN_TAG $(date) ===" >> "$QL"
# if the pair ships, its bs8 cell must exist too
if [ "$PAIR_WINS" = "1" ]; then
  attr_arm bs8_bc6_deconv 8 TERRAIN_BC_BWD=conv6 TERRAIN_DECONV_BWD=conv
fi

# ---- Phase C: 600-epoch 512px quality trajectory through the winner ----
# identical recipe/seeds to stable512_shipped (chain D phase Q5)
if [ ! -f docs/artifacts_r4/stable512_bc6/results.txt ]; then
  ( export TERRAIN_SYNTHETIC=1 TERRAIN_FAST=1 TERRAIN_SCAN=15 TERRAIN_SWD=1 \
       TERRAIN_EPOCHS=600 TERRAIN_SAVE_EVERY=100 TERRAIN_RESUME=auto \
       TERRAIN_ARTIFACT_EVERY=25 \
       TERRAIN_OUT=output_bc6 TERRAIN_MODELS=models_bc6
    for kv in "${WIN_KNOBS[@]}"; do export "${kv?}"; done
    run "$LOG/s512_bc6.log" 14400 \
      python -m terrain_tpu test1_nobn_bilin_both_stable train )
  python tools/summarize_run.py output_bc6/test1_nobn_bilin_both_stable \
    > "$LOG/s512_bc6_summary.txt" 2>&1 || true
  mkdir -p docs/artifacts_r4/stable512_bc6
  cp "$LOG/s512_bc6_summary.txt" \
    docs/artifacts_r4/stable512_bc6/summary.txt 2>/dev/null || true
  echo "winning composition: $WIN_TAG (${WIN_KNOBS[*]})" \
    > docs/artifacts_r4/stable512_bc6/knobs.txt
  python tools/pack_artifacts.py output_bc6/test1_nobn_bilin_both_stable \
    docs/artifacts_r4/stable512_bc6 >> "$QL" 2>&1 || true
  python tools/compare_runs.py docs/artifacts_r4/stable512_shipped \
    docs/artifacts_r4/stable512_bc6 --label-a shipped --label-b "$WIN_TAG" \
    > docs/artifacts_r4/stable512_bc6/compare_vs_shipped.txt 2>&1 || true
  git add docs/artifacts_r4/stable512_bc6 >/dev/null 2>&1 || true
  git commit -q -m "r4 chain G: 512px 600ep quality trajectory through $WIN_TAG backward" \
    -- docs/artifacts_r4/stable512_bc6 >/dev/null 2>&1 || true
fi
echo "=== Phase C done $(date) ===" >> "$QL"

# ---- Phase D: warm bench under the winning knobs ----
if ! grep -q '"tag": "bench_r4_bc6"' "$ART/attr_results.jsonl" 2>/dev/null; then
  ( for kv in "${WIN_KNOBS[@]}"; do export "${kv?}"; done
    run "$LOG/bench_bc6.log" 3600 python bench.py )
  tagit "$LOG/bench_bc6.log" bench_r4_bc6
  land_jsonl "bench under $WIN_TAG knobs"
fi
echo "=== chain R4G done $(date) ===" >> "$QL"
