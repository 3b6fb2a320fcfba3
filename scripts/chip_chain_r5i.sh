#!/bin/bash
# Round-5 chain I: earth256_stable (REAL NASA crops) to the reference's
# full 1000-epoch budget, with the external anchor computed at several
# checkpoints.  Settles RESULTS_r5 §5's open question: on earth256 the
# internal swd pick (e350) anchored WORSE than e600 (0.2404 vs 0.1843) —
# does the anchor keep improving with the full budget, or was e600 the
# knee?  Resumable; commits incrementally.
set -u
cd /root/repo
LOG=/tmp/chipr5i
ART=docs/artifacts_r5
QL=$LOG/queue.log
mkdir -p "$LOG" "$ART/earth256_stable_r5_1000" "$ART/published_anchor"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export TERRAIN_DTYPE=bf16

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
}

run() {
  local log="$1" to="$2"; shift 2
  for attempt in 1 2 3; do
    probe
    timeout "$to" "$@" > "$log" 2>&1 && return 0
    echo "arm failed (attempt $attempt, $(date)): $*" >> "$QL"
    sleep 60
  done
  return 1
}

echo "=== chain R5I starting $(date) ===" >> "$QL"

# ---- Phase A: resume 600 -> 1000 (chain-E recipe, only EPOCHS differs) ----
last_epoch=$(tail -1 output/earth256_stable/results.txt 2>/dev/null | cut -d, -f1)
if [ "${last_epoch:-0}" -lt 1000 ]; then
  ( export TERRAIN_SCAN=15 TERRAIN_SWD=1 TERRAIN_SAVE_EVERY=50 \
       TERRAIN_RESUME=auto TERRAIN_EPOCHS=1000
    run "$LOG/e256_train.log" 14400 python -m terrain_tpu earth256_stable \
      train )
fi
python tools/summarize_run.py output/earth256_stable \
  > "$ART/earth256_stable_r5_1000/summary.txt" 2>&1 || true
python tools/pack_artifacts.py output/earth256_stable \
  "$ART/earth256_stable_r5_1000" >> "$QL" 2>&1 || true
git add "$ART/earth256_stable_r5_1000" >/dev/null 2>&1 || true
git commit -q -m "r5 chain I: earth256 trajectory extended to 1000 epochs" \
  -- "$ART/earth256_stable_r5_1000" >/dev/null 2>&1 || true
echo "=== Phase A done $(date) ===" >> "$QL"

# ---- Phase B: gen arms at several checkpoints + 256px anchors ----
gen_arm() {  # gen_arm <dest> <pick>
  local dest="$1" pick="$2"
  [ -d "$dest" ] && return 0
  rm -rf output/earth256_stable/gen
  ( export TERRAIN_PICK="$pick"
    probe
    timeout 3000 python -m terrain_tpu earth256_stable gen \
      > "$LOG/gen_$(basename "$dest").log" 2>&1 )
  if [ -d output/earth256_stable/gen ]; then
    mkdir -p "$(dirname "$dest")"
    mv output/earth256_stable/gen "$dest"
  fi
  echo "=== gen $(basename "$dest") done $(date) ===" >> "$QL"
}

anchor() {  # anchor <tag> <gen_dir>   (stderr SEPARATED: .err, not the txt)
  local tag="$1" dir="$2"
  [ -f "$ART/published_anchor/$tag.txt" ] && return 0
  [ -d "$dir" ] || return 0
  TERRAIN_PLATFORM=cpu timeout 1200 python tools/compare_published.py \
    "$dir" --scale 256 --real-h5 data/earth256.h5 \
    > "$ART/published_anchor/$tag.txt" 2> "$LOG/anchor_$tag.err" || true
  echo "=== anchor $tag done $(date) ===" >> "$QL"
}

gen_arm /tmp/r5gen/e256_1000best swd
grep '\[pick\]' "$LOG/gen_e256_1000best.log" \
  > "$ART/pick_epoch/e256_1000_best_pick.txt" 2>/dev/null || true
gen_arm /tmp/r5gen/e256_e800 800
gen_arm /tmp/r5gen/e256_e1000 1000

anchor e256_1000best_256px /tmp/r5gen/e256_1000best
anchor e256_800_256px /tmp/r5gen/e256_e800
anchor e256_1000_256px /tmp/r5gen/e256_e1000

sheet() {
  [ -f "$2" ] && return 0
  [ -d "$1" ] || return 0
  timeout 600 python tools/make_gen_sheet.py "$1" "$2" --k 5 \
    >> "$QL" 2>&1 || true
}
sheet /tmp/r5gen/e256_e1000 "$ART/pick_epoch/e256_sheet_e1000.png"

git add "$ART/published_anchor" "$ART/pick_epoch" >/dev/null 2>&1 || true
git commit -q -m "r5 chain I: earth256 1000ep gen arms + multi-epoch anchors" \
  -- "$ART/published_anchor" "$ART/pick_epoch" >/dev/null 2>&1 || true
echo "=== chain R5I done $(date) ===" >> "$QL"
