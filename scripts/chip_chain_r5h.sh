#!/bin/bash
# Round-5 chain H: flagship 512px trajectory to the reference's FULL
# 1000-epoch budget (reference README trains 1000, publishes ~e593; every
# repo trajectory so far stopped at 600).  Resumes the chain-C run
# (output_r5/models_r5, e600) with save cadence 50 over the extension, so
# the swd pick is non-degenerate at 512px too.  Then: summary + packed
# artifacts, swd-pick + explicit-e1000 gen arms, published anchors,
# sheets.  Resumable; commits incrementally.
set -u
cd /root/repo
LOG=/tmp/chipr5h
ART=docs/artifacts_r5
QL=$LOG/queue.log
S512=test1_nobn_bilin_both_stable
mkdir -p "$LOG" "$ART/stable512_r5_1000"
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

echo "=== chain R5H starting $(date) ===" >> "$QL"

# ---- Phase A: resume 600 -> 1000 (same recipe/seeds as chain C Phase D,
# shipped defaults; only EPOCHS and the extension's save cadence differ) ----
last_epoch=$(tail -1 "output_r5/$S512/results.txt" 2>/dev/null | cut -d, -f1)
if [ "${last_epoch:-0}" -lt 1000 ]; then
  ( export TERRAIN_SYNTHETIC=1 TERRAIN_FAST=1 TERRAIN_SCAN=15 TERRAIN_SWD=1 \
       TERRAIN_EPOCHS=1000 TERRAIN_SAVE_EVERY=50 TERRAIN_RESUME=auto \
       TERRAIN_ARTIFACT_EVERY=25 \
       TERRAIN_OUT=output_r5 TERRAIN_MODELS=models_r5
    run "$LOG/s512_1000.log" 14400 python -m terrain_tpu "$S512" train )
fi
python tools/summarize_run.py "output_r5/$S512" \
  > "$ART/stable512_r5_1000/summary.txt" 2>&1 || true
python tools/pack_artifacts.py "output_r5/$S512" "$ART/stable512_r5_1000" \
  >> "$QL" 2>&1 || true
git add "$ART/stable512_r5_1000" >/dev/null 2>&1 || true
git commit -q -m "r5 chain H: 512px trajectory extended to 1000 epochs" \
  -- "$ART/stable512_r5_1000" >/dev/null 2>&1 || true
echo "=== Phase A done $(date) ===" >> "$QL"

# ---- Phase B: gen arms (swd pick over the full trend; explicit e1000) ----
gen_arm() {  # gen_arm <dest> <pick>
  local dest="$1" pick="$2"
  [ -d "$dest" ] && return 0
  rm -rf "output_r5/$S512/gen"
  ( export TERRAIN_OUT=output_r5 TERRAIN_MODELS=models_r5 TERRAIN_PICK="$pick"
    probe
    timeout 3000 python -m terrain_tpu "$S512" gen \
      > "$LOG/gen_$(basename "$dest").log" 2>&1 )
  if [ -d "output_r5/$S512/gen" ]; then
    mkdir -p "$(dirname "$dest")"
    mv "output_r5/$S512/gen" "$dest"
  fi
  echo "=== gen $(basename "$dest") done $(date) ===" >> "$QL"
}

gen_arm /tmp/r5gen/s512_1000best swd
gen_arm /tmp/r5gen/s512_1000 1000
grep '\[pick\]' "$LOG/gen_s512_1000best.log" \
  > "$ART/pick_epoch/s512_1000_best_pick.txt" 2>/dev/null || true

# ---- Phase C: published anchors + sheets ----
anchor() {  # anchor <tag> <gen_dir>
  local tag="$1" dir="$2"
  [ -f "$ART/published_anchor/$tag.txt" ] && return 0
  [ -d "$dir" ] || return 0
  TERRAIN_PLATFORM=cpu timeout 1200 python tools/compare_published.py \
    "$dir" --scale 512 > "$ART/published_anchor/$tag.txt" 2>&1 || true
  echo "=== anchor $tag done $(date) ===" >> "$QL"
}

anchor s512_1000best_512px /tmp/r5gen/s512_1000best
anchor s512_1000_512px /tmp/r5gen/s512_1000

sheet() {
  [ -f "$2" ] && return 0
  [ -d "$1" ] || return 0
  timeout 600 python tools/make_gen_sheet.py "$1" "$2" --k 5 \
    >> "$QL" 2>&1 || true
}
sheet /tmp/r5gen/s512_1000best "$ART/pick_epoch/s512_1000_sheet_best.png"
sheet /tmp/r5gen/s512_1000 "$ART/pick_epoch/s512_1000_sheet_e1000.png"

git add "$ART/published_anchor" "$ART/pick_epoch" >/dev/null 2>&1 || true
git commit -q -m "r5 chain H: 1000ep gen arms, anchors, sheets" \
  -- "$ART/published_anchor" "$ART/pick_epoch" >/dev/null 2>&1 || true
echo "=== chain R5H done $(date) ===" >> "$QL"
