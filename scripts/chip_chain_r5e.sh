#!/bin/bash
# Round-5 chain E: redo of chain C's Phase E + the e256 half of Phase F.
# Chain C's earth256 leg failed end-to-end because the reprovisioned host
# had no data/ directory and tools/build_dataset.py did not create parent
# dirs (fixed in the same commit as this script) — the chain then committed
# a traceback as earth256_stable_r5_summary.txt and left error-stub pick
# files.  This chain waits for chains C and D to release the chip, then:
#   1. rebuilds data/earth256.h5 (builder now mkdirs),
#   2. retrains earth256_stable with the round-4 recipe (SCAN=15, SWD=1,
#      SAVE_EVERY=50 — cadence 50 makes the e-best pick non-degenerate),
#   3. packs the run + replaces the traceback summary,
#   4. gen arms e-best (TERRAIN_PICK=swd) vs e600 (=name), 256px anchors
#      against the reference's published samples, contact sheets, picks.
# Every phase resumable; commits incrementally (CLAUDE.md trap).
set -u
cd /root/repo
LOG=/tmp/chipr5e
ART=docs/artifacts_r5
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART/published_anchor" "$ART/pick_epoch"
echo "=== chain R5E starting $(date) ===" >> "$QL"

for pidf in /tmp/chipr5c.pid /tmp/chipr5d.pid; do
  while [ -f "$pidf" ] && ps -p "$(cat "$pidf")" >/dev/null 2>&1; do
    sleep 120
  done
done
echo "=== chains C+D done, starting E $(date) ===" >> "$QL"

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

# ---- 1. dataset ----
if [ ! -f data/earth256.h5 ]; then
  if run "$LOG/build_ds.log" 1800 python tools/build_dataset.py \
      --heightmap /root/reference/md/earth_heightmap.png \
      --texture /root/reference/md/earth_texture.jpg \
      --out data/earth256.h5 --crop 256 --stride 16; then
    echo "=== dataset built $(date) ===" >> "$QL"
  else
    echo "=== DATASET BUILD FAILED — aborting $(date) ===" >> "$QL"
    exit 1
  fi
fi

# ---- 2. retrain (round-4 recipe) ----
if [ ! -f output/earth256_stable/results.txt ]; then
  ( export TERRAIN_SCAN=15 TERRAIN_SWD=1 TERRAIN_SAVE_EVERY=50 \
       TERRAIN_RESUME=auto
    run "$LOG/e256_train.log" 14400 python -m terrain_tpu earth256_stable \
      train )
fi
if [ -f output/earth256_stable/results.txt ]; then
  python tools/summarize_run.py output/earth256_stable \
    > "$LOG/e256_summary.txt" 2>&1 || true
  cp "$LOG/e256_summary.txt" "$ART/earth256_stable_r5_summary.txt" \
    2>/dev/null || true
  mkdir -p "$ART/earth256_stable_r5"
  python tools/pack_artifacts.py output/earth256_stable \
    "$ART/earth256_stable_r5" >> "$QL" 2>&1 || true
  python tools/compare_runs.py docs/artifacts_r4/earth256_stable_shipped \
    "$ART/earth256_stable_r5" --label-a r4_shipped --label-b r5 \
    > "$ART/earth256_stable_r5/compare_vs_r4.txt" 2>&1 || true
  git add "$ART/earth256_stable_r5_summary.txt" "$ART/earth256_stable_r5" \
    >/dev/null 2>&1 || true
  git commit -q -m "r5 chain E: earth256_stable retrain (real summary)" \
    -- "$ART/earth256_stable_r5_summary.txt" "$ART/earth256_stable_r5" \
    >/dev/null 2>&1 || true
  echo "=== retrain packed $(date) ===" >> "$QL"
else
  echo "=== RETRAIN FAILED — aborting $(date) ===" >> "$QL"
  exit 1
fi

# ---- 3. gen arms + anchors + sheets ----
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
gen_arm /tmp/r5gen/e256_best swd
gen_arm /tmp/r5gen/e256_600  name

anchor() {  # anchor <tag> <gen_dir>
  local tag="$1" dir="$2"
  [ -s "$ART/published_anchor/$tag.txt" ] \
    && ! grep -q Traceback "$ART/published_anchor/$tag.txt" && return 0
  [ -d "$dir" ] || return 0
  TERRAIN_PLATFORM=cpu timeout 1200 python tools/compare_published.py \
    "$dir" --scale 256 --real-h5 data/earth256.h5 \
    > "$ART/published_anchor/$tag.txt" 2>&1 || true
  echo "=== anchor $tag done $(date) ===" >> "$QL"
}
anchor e256_best_256px /tmp/r5gen/e256_best
anchor e256_600_256px  /tmp/r5gen/e256_600

for b in e256_best e256_600; do
  d=/tmp/r5gen/$b
  [ -d "$d" ] || continue
  timeout 600 python tools/make_gen_sheet.py "$d" \
    "$ART/pick_epoch/${b#e256_}_tmp.png" --k 5 >/dev/null 2>&1 || true
done
# (sheet naming kept consistent with the s512 ones)
[ -f "$ART/pick_epoch/best_tmp.png" ] \
  && mv "$ART/pick_epoch/best_tmp.png" "$ART/pick_epoch/e256_sheet_best.png"
[ -f "$ART/pick_epoch/600_tmp.png" ] \
  && mv "$ART/pick_epoch/600_tmp.png" "$ART/pick_epoch/e256_sheet_600.png"
for b in e256_best e256_600; do
  log="$LOG/gen_$b.log"
  if [ -f "$log" ]; then
    grep -E "^\[pick\]|checkpoint" "$log" | head -3 \
      > "$ART/pick_epoch/${b}_pick.txt" || true
  fi
done
git add "$ART/published_anchor" "$ART/pick_epoch" >/dev/null 2>&1 || true
git commit -q -m "r5 chain E: earth256 gen arms, anchors, sheets" \
  -- "$ART/published_anchor" "$ART/pick_epoch" >/dev/null 2>&1 || true
echo "=== chain R5E done $(date) ===" >> "$QL"
