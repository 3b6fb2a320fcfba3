#!/bin/bash
# Round-5 chain C: consolidated post-reprovision resume.  The host VM was
# wiped mid-round (CLAUDE.md trap: /tmp, .jax_cache, data/, models/ gone),
# so this one serial queue finishes everything chains A/A2/B still owed,
# plus the forced rebuilds.  Supersedes chip_chain_r5a2.sh and
# chip_chain_r5b.sh (their phases are inlined here with the dirs fixed to
# what can actually be rebuilt).  Every phase is resumable (skipped when
# its artifact already landed) and commits incrementally.
#
# Phases:
#   A  chain-A leftovers: bs8_s2 retry (error log landed this time),
#      bs8_stem8
#   B  Pallas max-pool pair (ops/pallas/pool2.py): real-Mosaic compile
#      check FIRST (round-2 lesson), then bs4/bs8 in-context arms,
#      replicate on a win
#   C  mechanical composition decision + trace under the bs4 best
#   D  512px 600-epoch quality trajectory through the winning knobs
#      (doubles as the models_r5 checkpoint rebuild chain B needs)
#   E  data/earth256.h5 rebuild + earth256_stable 600ep retrain
#   F  chain-B proper: gen arms (e-best vs e-fixed), published-sample
#      anchors, contact sheets, pipelined delivery benches
#   G  bench.py warm-up so the driver's BENCH_r05 hits a warm cache
set -u
cd /root/repo
LOG=/tmp/chipr5c
ART=docs/artifacts_r5
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART/attr" "$ART/published_anchor" "$ART/pick_epoch"
echo "=== chain R5C starting $(date) ===" >> "$QL"

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
    # land the evidence, not just the flag (round-5 lesson: bs8_s2's
    # first failure log died with /tmp)
    tail -40 "$1" > "$ART/attr/err_$2.txt" 2>/dev/null || true
    git add "$ART/attr/err_$2.txt" >/dev/null 2>&1 || true
  fi
}

land_jsonl() {
  python tools/land_chip_results.py "$LOG/attr_results.jsonl" \
    "$ART/attr/attr_results.jsonl" >/dev/null 2>&1 || true
  git add "$ART/attr" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain C: $1" -- "$ART/attr" >/dev/null 2>&1 || true
}

attr_arm() {
  local tag="$1" bs="$2"; shift 2
  grep -q "\"tag\": \"$tag\"" "$ART/attr/attr_results.jsonl" 2>/dev/null \
    && return 0
  ( for kv in "$@"; do export "${kv?}"; done
    probe
    timeout 3000 python scripts/attr_bench.py full --bs "$bs" \
      > "$LOG/attr_$tag.log" 2>&1 )
  tagit "$LOG/attr_$tag.log" "$tag"
  land_jsonl "arm $tag"
  echo "=== attr $tag done $(date) ===" >> "$QL"
}

export TERRAIN_DTYPE=bf16

# ---- Phase A: chain-A leftovers ----
attr_arm bs8_s2 8 TERRAIN_PALLAS_CONVS2=1
attr_arm bs8_stem8 8 TERRAIN_STEM_TH=8

# ---- Phase B: Pallas max-pool pair ----
if ! grep -q '"tag": "pool2_compilecheck"' "$ART/attr/attr_results.jsonl" \
    2>/dev/null; then
  probe
  timeout 1800 python scripts/chip_check_pool2.py \
    > "$LOG/pool2_check.log" 2>&1
  tagit "$LOG/pool2_check.log" pool2_compilecheck
  land_jsonl "pool2 Mosaic compile check"
fi

POOL_OK=$(python - <<'EOF'
import json
for ln in open("docs/artifacts_r5/attr/attr_results.jsonl"):
    d = json.loads(ln)
    if d.get("tag") == "pool2_compilecheck" and "pool2_check" in d:
        bad = [k for k, v in d["pool2_check"].items()
               if "error" in v or v.get("fwd_maxerr", 1) > 1e-2
               or v.get("bwd_maxerr", 1) > 1e-2]
        print(0 if bad else 1)
        break
else:
    print(0)
EOF
)
echo "=== pool2 compile check ok=$POOL_OK $(date) ===" >> "$QL"
if [ "$POOL_OK" = "1" ]; then
  attr_arm bs4_poolpallas 4 TERRAIN_POOL_VJP=pallas
  attr_arm bs8_poolpallas 8 TERRAIN_POOL_VJP=pallas
fi

# ---- Phase C: composition decision + replicate + trace ----
POOL_WINS=$(python - <<'EOF'
import json
rows = {}
for ln in open("docs/artifacts_r5/attr/attr_results.jsonl"):
    d = json.loads(ln)
    if "step_ms" in d:
        rows[d["tag"]] = d["step_ms"]
base = rows.get("bs4_r5base", 61.05)
cand = rows.get("bs4_poolpallas", 999)
print(1 if cand < base - 0.5 else 0)
EOF
)
if [ "$POOL_WINS" = "1" ]; then
  attr_arm bs4_poolpallas_rep 4 TERRAIN_POOL_VJP=pallas
  POOL_WINS=$(python - <<'EOF'
import json
rows = {}
for ln in open("docs/artifacts_r5/attr/attr_results.jsonl"):
    d = json.loads(ln)
    if "step_ms" in d:
        rows[d["tag"]] = d["step_ms"]
base = rows.get("bs4_r5base", 61.05)
rep = rows.get("bs4_poolpallas_rep", 999)
print(1 if rep < base - 0.5 else 0)
EOF
)
fi
if [ "$POOL_WINS" = "1" ]; then
  WIN_KNOBS=(TERRAIN_POOL_VJP=pallas)
  WIN_TAG=poolpallas
else
  WIN_KNOBS=()
  WIN_TAG=shipped
fi
echo "=== decision: winning composition = $WIN_TAG $(date) ===" >> "$QL"
echo "$WIN_TAG" > "$LOG/win_tag.txt"

if [ ! -f "$ART/attr/trace_r5best.csv" ]; then
  rm -rf /tmp/trace_r5best
  ( for kv in "${WIN_KNOBS[@]:-}"; do [ -n "$kv" ] && export "${kv?}"; done
    probe
    TERRAIN_PROFILE=/tmp/trace_r5best timeout 2400 \
      python scripts/attr_bench.py profile > "$LOG/profile_r5best.log" 2>&1 )
  tj=$(find /tmp/trace_r5best -name "*.trace.json.gz" 2>/dev/null | head -1)
  if [ -n "$tj" ]; then
    python tools/summarize_trace.py "$tj" --csv "$ART/attr/trace_r5best.csv" \
      > "$ART/attr/trace_r5best_summary.txt" 2>&1 || true
    echo "trace composition: $WIN_TAG" >> "$ART/attr/trace_r5best_summary.txt"
    git add "$ART/attr" >/dev/null 2>&1 || true
    git commit -q -m "r5 chain C: trace under $WIN_TAG composition" \
      -- "$ART/attr" >/dev/null 2>&1 || true
  fi
fi
echo "=== Phase C done $(date) ===" >> "$QL"

# ---- Phase D: 512px 600ep trajectory through the winner (models_r5) ----
# identical recipe/seeds to docs/artifacts_r4/stable512_{shipped,bc6}
S512=test1_nobn_bilin_both_stable
if [ ! -f "$ART/stable512_r5/results.txt" ]; then
  ( export TERRAIN_SYNTHETIC=1 TERRAIN_FAST=1 TERRAIN_SCAN=15 TERRAIN_SWD=1 \
       TERRAIN_EPOCHS=600 TERRAIN_SAVE_EVERY=100 TERRAIN_RESUME=auto \
       TERRAIN_ARTIFACT_EVERY=25 \
       TERRAIN_OUT=output_r5 TERRAIN_MODELS=models_r5
    for kv in "${WIN_KNOBS[@]:-}"; do [ -n "$kv" ] && export "${kv?}"; done
    run "$LOG/s512_r5.log" 14400 python -m terrain_tpu "$S512" train )
  python tools/summarize_run.py "output_r5/$S512" \
    > "$LOG/s512_r5_summary.txt" 2>&1 || true
  mkdir -p "$ART/stable512_r5"
  cp "$LOG/s512_r5_summary.txt" "$ART/stable512_r5/summary.txt" \
    2>/dev/null || true
  echo "winning composition: $WIN_TAG (${WIN_KNOBS[*]:-shipped defaults})" \
    > "$ART/stable512_r5/knobs.txt"
  python tools/pack_artifacts.py "output_r5/$S512" "$ART/stable512_r5" \
    >> "$QL" 2>&1 || true
  python tools/compare_runs.py docs/artifacts_r4/stable512_bc6 \
    "$ART/stable512_r5" --label-a r4_bc6 --label-b "r5_$WIN_TAG" \
    > "$ART/stable512_r5/compare_vs_r4bc6.txt" 2>&1 || true
  git add "$ART/stable512_r5" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain C: 512px 600ep trajectory through $WIN_TAG" \
    -- "$ART/stable512_r5" >/dev/null 2>&1 || true
fi
echo "=== Phase D done $(date) ===" >> "$QL"

# ---- Phase E: earth256 dataset + retrain ----
if [ ! -f data/earth256.h5 ]; then
  run "$LOG/build_ds.log" 1800 python tools/build_dataset.py \
    --heightmap /root/reference/md/earth_heightmap.png \
    --texture /root/reference/md/earth_texture.jpg \
    --out data/earth256.h5 --crop 256 --stride 16
  echo "=== dataset built $(date) ===" >> "$QL"
fi
if [ ! -f output/earth256_stable/results.txt ] \
    || [ ! -d models/earth256_stable ]; then
  run "$LOG/e256_train.log" 7200 python -m terrain_tpu earth256_stable train
  python tools/summarize_run.py output/earth256_stable \
    > "$ART/earth256_stable_r5_summary.txt" 2>&1 || true
  git add "$ART/earth256_stable_r5_summary.txt" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain C: earth256_stable retrain summary" \
    -- "$ART/earth256_stable_r5_summary.txt" >/dev/null 2>&1 || true
fi
echo "=== Phase E done $(date) ===" >> "$QL"

# ---- Phase F: gen arms + published anchors + sheets + delivery ----
gen_arm() {  # gen_arm <dest> <out_root> <models_root> <experiment> <pick>
  local dest="$1" outroot="$2" mroot="$3" exp="$4" pick="$5"
  [ -d "$dest" ] && return 0
  rm -rf "$outroot/$exp/gen"
  ( export TERRAIN_OUT="$outroot" TERRAIN_MODELS="$mroot" TERRAIN_PICK="$pick"
    probe
    timeout 3000 python -m terrain_tpu "$exp" gen \
      > "$LOG/gen_$(basename "$dest").log" 2>&1 )
  if [ -d "$outroot/$exp/gen" ]; then
    mkdir -p "$(dirname "$dest")"
    mv "$outroot/$exp/gen" "$dest"
  fi
  echo "=== gen $(basename "$dest") done $(date) ===" >> "$QL"
}

gen_arm /tmp/r5gen/s512_best output_r5 models_r5 "$S512" swd
gen_arm /tmp/r5gen/s512_600  output_r5 models_r5 "$S512" name
gen_arm /tmp/r5gen/e256_best output models earth256_stable swd
gen_arm /tmp/r5gen/e256_600  output models earth256_stable name

anchor() {  # anchor <tag> <gen_dir> <scale> [extra...]
  local tag="$1" dir="$2" scale="$3"; shift 3
  [ -f "$ART/published_anchor/$tag.txt" ] && return 0
  [ -d "$dir" ] || return 0
  TERRAIN_PLATFORM=cpu timeout 1200 python tools/compare_published.py \
    "$dir" --scale "$scale" "$@" > "$ART/published_anchor/$tag.txt" 2>&1 \
    || true
  git add "$ART/published_anchor" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain C: published anchor $tag" \
    -- "$ART/published_anchor" >/dev/null 2>&1 || true
  echo "=== anchor $tag done $(date) ===" >> "$QL"
}

anchor s512_best_512px /tmp/r5gen/s512_best 512
anchor s512_600_512px  /tmp/r5gen/s512_600 512
anchor e256_best_256px /tmp/r5gen/e256_best 256 --real-h5 data/earth256.h5
anchor e256_600_256px  /tmp/r5gen/e256_600 256 --real-h5 data/earth256.h5

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
git commit -q -m "r5 chain C: e-best vs e-fixed gen sheets + anchors" \
  -- "$ART/pick_epoch" >/dev/null 2>&1 || true
echo "=== Phase F sheets done $(date) ===" >> "$QL"

if [ ! -s "$ART/bench_gen_r5.json" ]; then
  probe
  ( export TERRAIN_OUT=output_r5 TERRAIN_MODELS=models_r5
    timeout 3000 python scripts/bench_gen.py --bs 8 --enc png \
      > "$LOG/bench_gen.log" 2>&1 ) || true
  tail -1 "$LOG/bench_gen.log" | grep '^{' > "$ART/bench_gen_r5.json" || true
  git add "$ART/bench_gen_r5.json" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain C: pipelined gen delivery bench" \
    -- "$ART/bench_gen_r5.json" >/dev/null 2>&1 || true
fi
if [ ! -s "$ART/bench_serve_r5.json" ]; then
  probe
  timeout 3600 python scripts/bench_serve.py --enc png --clients 4 \
    --requests 24 > "$LOG/bench_serve.log" 2>&1 || true
  grep -h '^{' "$LOG/bench_serve.log" /tmp/bench_serve.json 2>/dev/null \
    | tail -1 > "$ART/bench_serve_r5.json" || true
  git add "$ART/bench_serve_r5.json" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain C: serve bench with unlocked fetch" \
    -- "$ART/bench_serve_r5.json" >/dev/null 2>&1 || true
fi
echo "=== Phase F done $(date) ===" >> "$QL"

# ---- Phase G: warm the driver's bench (shipped defaults) ----
if ! grep -q '"tag": "bench_r5_final"' "$ART/attr/attr_results.jsonl" \
    2>/dev/null; then
  run "$LOG/bench_final.log" 3600 python bench.py
  tagit "$LOG/bench_final.log" bench_r5_final
  land_jsonl "final shipped-defaults bench warm"
fi
echo "=== chain R5C done $(date) ===" >> "$QL"
