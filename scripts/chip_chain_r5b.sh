#!/bin/bash
# Round-5 chain B (waits for chain A): externally-anchored quality + the
# publication-epoch workflow + pipelined delivery benches.
#   1. gen-mode sample sets from the flagship 512px (bc6) and earth256
#      checkpoints, at BOTH the swd-picked best epoch (TERRAIN_PICK=swd,
#      the new default) and the reference's fixed epoch (TERRAIN_PICK=name)
#   2. SWD + terrain-W1 anchor of each set against the reference's 20
#      PUBLISHED samples (dump_a_bakup_593ish, README.md:48-61) via
#      tools/compare_published.py (VERDICT item 3)
#   3. contact sheets e-best vs e-fixed (VERDICT item 5 done-criterion)
#   4. bench_gen pipelined arms + bench_serve png (VERDICT item 8)
set -u
cd /root/repo
LOG=/tmp/chipr5b
ART=docs/artifacts_r5
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART/published_anchor" "$ART/pick_epoch"
echo "=== chain R5B starting $(date) ===" >> "$QL"

# wait for chains A and A2 (one TPU user at a time)
for p in /tmp/chipr5a.pid /tmp/chipr5a2.pid; do
  while [ -f "$p" ] && ps -p "$(cat "$p")" >/dev/null 2>&1; do
    sleep 120
  done
done
echo "=== chains A/A2 done, starting B $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
}

export TERRAIN_DTYPE=bf16

# ---- Phase A: sample sets (on chip: 512px two-stage foward) ----
# gen writes to $TERRAIN_OUT/<name>/gen; the swd picker needs swd.txt in
# the run's own out dir, so we generate in place and mv the result aside.
gen_arm() {  # gen_arm <dest> <out_root> <models_root> <experiment> <pick>
  local dest="$1" outroot="$2" mroot="$3" exp="$4" pick="$5"
  [ -d "$dest" ] && return 0
  rm -rf "$outroot/$exp/gen"
  ( export TERRAIN_OUT="$outroot" TERRAIN_MODELS="$mroot" TERRAIN_PICK="$pick"
    probe
    timeout 3000 python -m terrain_tpu "$exp" gen \
      > "$LOG/gen_$(basename "$dest").log" 2>&1 )
  if [ -d "$outroot/$exp/gen" ]; then
    mv "$outroot/$exp/gen" "$dest"
  fi
  echo "=== gen $(basename "$dest") done $(date) ===" >> "$QL"
}

S512=test1_nobn_bilin_both_stable
gen_arm /tmp/r5gen/s512_best output_bc6 models_bc6 "$S512" swd
gen_arm /tmp/r5gen/s512_600  output_bc6 models_bc6 "$S512" name
gen_arm /tmp/r5gen/e256_best output models earth256_stable swd
gen_arm /tmp/r5gen/e256_600  output models earth256_stable name

# ---- Phase B: published-sample anchor (CPU-forced metrics) ----
anchor() {  # anchor <tag> <gen_dir> <scale> [extra...]
  local tag="$1" dir="$2" scale="$3"; shift 3
  [ -f "$ART/published_anchor/$tag.txt" ] && return 0
  [ -d "$dir" ] || return 0
  TERRAIN_PLATFORM=cpu timeout 1200 python tools/compare_published.py \
    "$dir" --scale "$scale" "$@" > "$ART/published_anchor/$tag.txt" 2>&1 \
    || true
  git add "$ART/published_anchor" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain B: published anchor $tag" \
    -- "$ART/published_anchor" >/dev/null 2>&1 || true
  echo "=== anchor $tag done $(date) ===" >> "$QL"
}

anchor s512_best_512px /tmp/r5gen/s512_best 512
anchor s512_600_512px  /tmp/r5gen/s512_600 512
anchor e256_best_256px /tmp/r5gen/e256_best 256 --real-h5 data/earth256.h5
anchor e256_600_256px  /tmp/r5gen/e256_600 256 --real-h5 data/earth256.h5

# ---- Phase C: e-best vs e-fixed contact sheets ----
sheet() {  # sheet <src> <dst>
  [ -f "$2" ] && return 0
  [ -d "$1" ] || return 0
  timeout 600 python tools/make_gen_sheet.py "$1" "$2" --k 5 \
    >> "$QL" 2>&1 || true
}
sheet /tmp/r5gen/s512_best "$ART/pick_epoch/s512_sheet_best.png"
sheet /tmp/r5gen/s512_600  "$ART/pick_epoch/s512_sheet_600.png"
sheet /tmp/r5gen/e256_best "$ART/pick_epoch/e256_sheet_best.png"
sheet /tmp/r5gen/e256_600  "$ART/pick_epoch/e256_sheet_600.png"
for d in /tmp/r5gen/s512_best /tmp/r5gen/s512_600 \
         /tmp/r5gen/e256_best /tmp/r5gen/e256_600; do
  b=$(basename "$d")
  log="$LOG/gen_$b.log"
  if [ -f "$log" ] && ! [ -f "$ART/pick_epoch/${b}_pick.txt" ]; then
    grep -E "^\[pick\]|checkpoint" "$log" | head -3 \
      > "$ART/pick_epoch/${b}_pick.txt" || true
  fi
done
git add "$ART/pick_epoch" >/dev/null 2>&1 || true
git commit -q -m "r5 chain B: e-best vs e-fixed gen sheets" \
  -- "$ART/pick_epoch" >/dev/null 2>&1 || true
echo "=== Phase C done $(date) ===" >> "$QL"

# ---- Phase D: pipelined delivery benches ----
if [ ! -f "$ART/bench_gen_r5.json" ]; then
  probe
  timeout 3000 python scripts/bench_gen.py --bs 8 --enc png \
    > "$LOG/bench_gen.log" 2>&1 || true
  tail -1 "$LOG/bench_gen.log" | grep '^{' > "$ART/bench_gen_r5.json" || true
  git add "$ART/bench_gen_r5.json" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain B: pipelined gen delivery bench" \
    -- "$ART/bench_gen_r5.json" >/dev/null 2>&1 || true
fi
if [ ! -f "$ART/bench_serve_r5.json" ]; then
  probe
  timeout 3600 python scripts/bench_serve.py --enc png --clients 4 \
    --requests 24 > "$LOG/bench_serve.log" 2>&1 || true
  grep -h '^{' "$LOG/bench_serve.log" /tmp/bench_serve.json 2>/dev/null \
    | tail -1 > "$ART/bench_serve_r5.json" || true
  git add "$ART/bench_serve_r5.json" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain B: serve bench with unlocked fetch" \
    -- "$ART/bench_serve_r5.json" >/dev/null 2>&1 || true
fi
echo "=== chain R5B done $(date) ===" >> "$QL"
