#!/bin/bash
# Round-4 chain D: consolidated re-run of everything the host re-provision
# killed, in verdict-priority order.  Every arm commits its artifacts the
# moment it lands (round-3 lesson); every phase is skipped if its artifact
# already exists, so the chain is resumable after any interruption.
#
# Order (VERDICT r3 priorities):
#   T  composition traces thin/base/s2thin (+ the chain-P matrix hole arm)
#   Q5 512px both-mode 600ep: shipped kernels vs TERRAIN_PALLAS_CONV=0
#   Q2 earth256 quality redux: dataset -> stable 600ep -> finetune 600ep
#      -> interp clip + filmstrip + gen sheet (the round-3 filmstrip gap)
#   W  serve wire-format A/B (npy/png/png-noqfetch) + bench_gen png
#   N  north-star recipe runs + bench.py
#   M  bs=8 kernel matrix + tile A/Bs
#   F  final bench.py (warms .jax_cache for the driver's end-of-round run)
set -u
cd /root/repo
LOG=/tmp/chipr4d
ART=docs/artifacts_r4/attr
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART" data
echo "=== chain R4D starting $(date) ===" >> "$QL"

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

land_jsonl() {
  python tools/land_chip_results.py "$LOG/attr_results.jsonl" \
    "$ART/attr_results.jsonl" >/dev/null 2>&1 || true
  git add "$ART" >/dev/null 2>&1 || true
  git commit -q -m "r4 chain D: $1" -- "$ART" >/dev/null 2>&1 || true
}

tagit() {
  tail -1 "$1" | grep '^{' | sed "s/^{/{\"tag\": \"$2\", /" \
    >> "$LOG/attr_results.jsonl" || \
    echo "{\"tag\": \"$2\", \"error\": true}" >> "$LOG/attr_results.jsonl"
}

land() {  # land <output_dir> <artifact_name> <msg>
  python tools/pack_artifacts.py "$1" "docs/artifacts_r4/$2" \
    >> "$QL" 2>&1 || true
  git add "docs/artifacts_r4/$2" >/dev/null 2>&1 || true
  git commit -q -m "r4 chain D: $3" -- "docs/artifacts_r4/$2" \
    >/dev/null 2>&1 || true
}

export TERRAIN_DTYPE=bf16

# ---- Phase T: composition traces (VERDICT item 2) ----
trace_arm() {
  local name="$1"; shift
  [ -f "$ART/trace_${name}.csv" ] && return 0
  rm -rf "/tmp/trace_$name"
  ( for kv in "$@"; do export "${kv?}"; done
    probe
    TERRAIN_PROFILE="/tmp/trace_$name" timeout 2400 \
      python scripts/attr_bench.py profile > "$LOG/profile_$name.log" 2>&1 )
  local tj
  tj=$(find "/tmp/trace_$name" -name "*.trace.json.gz" 2>/dev/null | head -1)
  if [ -n "$tj" ]; then
    python tools/summarize_trace.py "$tj" --csv "$ART/trace_${name}.csv" \
      > "$ART/trace_${name}_summary.txt" 2>&1 || true
    git add "$ART" >/dev/null 2>&1 || true
    git commit -q -m "r4 chain D: device trace $name (composition diff)" \
      -- "$ART" >/dev/null 2>&1 || true
  fi
  echo "=== trace $name done $(date) ===" >> "$QL"
}
trace_arm thin
trace_arm base   TERRAIN_PALLAS_THIN=0
trace_arm s2thin TERRAIN_PALLAS_CONVS2=1

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
# the hole in the chain-P matrix: thin+actbwd WITHOUT s2 was never measured
attr_arm bs4_thin_actbwd 4 TERRAIN_ACT_BWD=1

# ---- Phase Q5: 512px both-mode shipped-vs-kernels-off (VERDICT item 1) ----
export TERRAIN_SYNTHETIC=1 TERRAIN_FAST=1 TERRAIN_SCAN=15 TERRAIN_SWD=1 \
       TERRAIN_EPOCHS=600 TERRAIN_SAVE_EVERY=100 TERRAIN_RESUME=auto \
       TERRAIN_ARTIFACT_EVERY=25
if [ ! -f docs/artifacts_r4/stable512_shipped/results.txt ]; then
  run "$LOG/s512_shipped.log" 14400 \
    python -m terrain_tpu test1_nobn_bilin_both_stable train
  python tools/summarize_run.py output/test1_nobn_bilin_both_stable \
    > "$LOG/s512_shipped_summary.txt" 2>&1 || true
  mkdir -p docs/artifacts_r4/stable512_shipped
  cp "$LOG/s512_shipped_summary.txt" \
    docs/artifacts_r4/stable512_shipped/summary.txt 2>/dev/null || true
  land output/test1_nobn_bilin_both_stable stable512_shipped \
    "512px both-mode 600ep through shipped kernel defaults"
fi
echo "=== 512 shipped arm done $(date) ===" >> "$QL"

if [ ! -f docs/artifacts_r4/stable512_kernels_off/results.txt ]; then
  TERRAIN_PALLAS_CONV=0 TERRAIN_OUT=output_koff TERRAIN_MODELS=models_koff \
    run "$LOG/s512_koff.log" 14400 \
    python -m terrain_tpu test1_nobn_bilin_both_stable train
  python tools/summarize_run.py output_koff/test1_nobn_bilin_both_stable \
    > "$LOG/s512_koff_summary.txt" 2>&1 || true
  mkdir -p docs/artifacts_r4/stable512_kernels_off
  cp "$LOG/s512_koff_summary.txt" \
    docs/artifacts_r4/stable512_kernels_off/summary.txt 2>/dev/null || true
  land output_koff/test1_nobn_bilin_both_stable stable512_kernels_off \
    "512px both-mode 600ep kernels-off control arm"
fi
unset TERRAIN_SYNTHETIC TERRAIN_EPOCHS TERRAIN_ARTIFACT_EVERY TERRAIN_FAST
echo "=== Phase Q5 done $(date) ===" >> "$QL"

# ---- Phase Q2: earth256 redux (checkpoints died with the host) ----
if [ ! -f data/earth256.h5 ]; then
  run "$LOG/build_ds.log" 1800 python tools/build_dataset.py \
    --heightmap /root/reference/md/earth_heightmap.png \
    --texture /root/reference/md/earth_texture.jpg \
    --out data/earth256.h5 --crop 256 --stride 16
  echo "=== dataset built $(date) ===" >> "$QL"
fi

export TERRAIN_SAVE_EVERY=100
if [ ! -f models/earth256_stable/600.model ]; then
  run "$LOG/e256_train.log" 7200 python -m terrain_tpu earth256_stable train
  # the trajectory evidence already landed in chain B; re-land only if the
  # artifact dir is missing (this re-run exists to regain the checkpoint)
  if [ ! -f docs/artifacts_r4/earth256_stable_shipped/results.txt ]; then
    land output/earth256_stable earth256_stable_shipped \
      "earth256_stable 600ep re-run (checkpoint regained)"
  fi
fi
echo "=== earth256_stable done $(date) ===" >> "$QL"

if [ ! -f models/earth256_finetunep2p/600.model ]; then
  run "$LOG/e256ft_train.log" 7200 \
    python -m terrain_tpu earth256_finetunep2p train
fi
echo "=== finetune train done $(date) ===" >> "$QL"

if [ ! -f docs/artifacts_r4/earth256_finetunep2p/interp_filmstrip.png ]; then
  ( unset TERRAIN_SCAN TERRAIN_RESUME
    run "$LOG/e256ft_interp.log" 5400 \
      python -m terrain_tpu earth256_finetunep2p interp )
  python tools/make_filmstrip.py \
    output/earth256_finetunep2p/interp_clip_concat_bothdet \
    docs/artifacts_r4/earth256_finetunep2p/interp_filmstrip.png --k 8 \
    >> "$QL" 2>&1 || true
  git add docs/artifacts_r4/earth256_finetunep2p >/dev/null 2>&1 || true
  git commit -q -m "r4 chain D: earth256_finetunep2p 100-sample interp clip filmstrip" \
    -- docs/artifacts_r4/earth256_finetunep2p >/dev/null 2>&1 || true
fi
echo "=== finetune interp done $(date) ===" >> "$QL"

if [ ! -f docs/artifacts_r4/earth256_finetunep2p/gen_600_sheet.png ]; then
  ( unset TERRAIN_SCAN TERRAIN_RESUME
    run "$LOG/e256ft_gen.log" 2400 \
      python -m terrain_tpu earth256_finetunep2p gen )
  python tools/make_gen_sheet.py output/earth256_finetunep2p/gen \
    docs/artifacts_r4/earth256_finetunep2p/gen_600_sheet.png \
    >> "$QL" 2>&1 || true
  git add docs/artifacts_r4/earth256_finetunep2p >/dev/null 2>&1 || true
  git commit -q -m "r4 chain D: earth256_finetunep2p gen sheet" \
    -- docs/artifacts_r4/earth256_finetunep2p >/dev/null 2>&1 || true
fi
unset TERRAIN_SAVE_EVERY
echo "=== Phase Q2 done $(date) ===" >> "$QL"

# ---- Phase W: serve wire-format A/B + gen throughput (VERDICT item 5) ----
serve_arm() {
  local tag="$1" enc="$2"; shift 2
  grep -q "\"tag\": \"$tag\"" "$ART/attr_results.jsonl" 2>/dev/null && return 0
  ( for kv in "$@"; do export "${kv?}"; done
    probe
    timeout 3600 python scripts/bench_serve.py \
      --experiment test1_nobn_bilin_both_stable --clients 4 --requests 40 \
      --max-batch 4 --enc "$enc" > "$LOG/serve_$tag.log" 2>&1 )
  tagit "$LOG/serve_$tag.log" "$tag"
  land_jsonl "serve $tag"
  echo "=== serve $tag done $(date) ===" >> "$QL"
}
serve_arm serve512_npy npy
serve_arm serve512_png png
serve_arm serve512_png_noqfetch png TERRAIN_SERVE_QFETCH=0

if ! grep -q '"tag": "bench_gen_r4"' "$ART/attr_results.jsonl" 2>/dev/null; then
  run "$LOG/bench_gen.log" 3600 python scripts/bench_gen.py --bs 4 8 --enc png
  tagit "$LOG/bench_gen.log" bench_gen_r4
  land_jsonl "bench_gen"
fi
echo "=== Phase W done $(date) ===" >> "$QL"

# ---- Phase N: north-star recipe (VERDICT item 7) ----
for bs in 4 8; do
  tag="northstar_bs$bs"
  grep -q "\"tag\": \"$tag\"" "$ART/attr_results.jsonl" 2>/dev/null && continue
  run "$LOG/$tag.log" 3000 python scripts/northstar.py --bs "$bs" --scan-k 15
  tagit "$LOG/$tag.log" "$tag"
  land_jsonl "$tag"
done
echo "=== Phase N done $(date) ===" >> "$QL"

# mid-chain bench (warms the driver-shape cache early in case the tail dies)
if ! grep -q '"tag": "bench_mid"' "$ART/attr_results.jsonl" 2>/dev/null; then
  run "$LOG/bench_mid.log" 3600 python bench.py
  tagit "$LOG/bench_mid.log" bench_mid
  land_jsonl "mid-chain bench"
fi

# ---- Phase M: bs=8 matrix + tile A/Bs (VERDICT item 6) ----
attr_arm bs8_default 8
attr_arm bs8_thin_off 8 TERRAIN_PALLAS_THIN=0
attr_arm bs8_thin_th8 8 TERRAIN_THIN_TH=8
attr_arm bs8_thin_th32 8 TERRAIN_THIN_TH=32
attr_arm bs8_stem_th16 8 TERRAIN_STEM_TH=16
attr_arm bs4_thin_th8 4 TERRAIN_THIN_TH=8
attr_arm bs4_thin_th32 4 TERRAIN_THIN_TH=32
attr_arm bs8_s2thin 8 TERRAIN_PALLAS_CONVS2=1
attr_arm bs8_actbwd 8 TERRAIN_ACT_BWD=1
echo "=== Phase M done $(date) ===" >> "$QL"

# ---- Phase F: final bench ----
run "$LOG/bench_final.log" 3600 python bench.py
tagit "$LOG/bench_final.log" bench_r4
land_jsonl "final bench"
echo "=== chain R4D done $(date) ===" >> "$QL"

# ---- Phase X: leaky save-scale VJP A/B (built mid-round from the 4a
# trace diff: 2.5 ms/step of standalone compare_select + copies at
# activations.py:23 in the shipped composition) ----
attr_arm bs4_leaky_mul 4 TERRAIN_LEAKY_MUL=1
attr_arm bs8_leaky_mul 8 TERRAIN_LEAKY_MUL=1
echo "=== Phase X done $(date) ===" >> "$QL"

# ---- Phase Y: AOT tail from chain A (RESULTS_r4 section 1 pendings) ----
# clean no_store re-run on the now-idle host (the chain-A arm shared the
# core with a test suite); rows=248 is relay-warm by now, which is this
# arm's intended semantics
if ! grep -q '"tag": "aot_no_store_rerun"' "$ART/attr_results.jsonl" 2>/dev/null; then
  rm -rf "$LOG/xa"
  run "$LOG/aot_no_store2.log" 3600 python scripts/aot_coldstart.py \
    --rows 248 --xla-cache "$LOG/xa"
  tagit "$LOG/aot_no_store2.log" aot_no_store_rerun
  land_jsonl "AOT no_store clean re-run"
fi
# serve bucket-ladder A/B: thin executables (weights are jit args), the
# one case where the store can still pay on the 2 MB/s relay
if ! grep -q '"tag": "serve_with_store"' "$ART/attr_results.jsonl" 2>/dev/null; then
  rm -rf "$LOG/serve_store" "$LOG/xs1" "$LOG/xs2"
  TERRAIN_AOT="$LOG/serve_store" run "$LOG/serve_pop.log" 5400 \
    python scripts/aot_serve_warmup.py --xla-cache "$LOG/xs1"
  tagit "$LOG/serve_pop.log" serve_populate
  TERRAIN_AOT="$LOG/serve_store" run "$LOG/serve_store.log" 5400 \
    python scripts/aot_serve_warmup.py --xla-cache "$LOG/xs2"
  tagit "$LOG/serve_store.log" serve_with_store
  land_jsonl "serve AOT ladder arms"
fi
echo "=== Phase Y done $(date) ===" >> "$QL"

# same-day bs4 shipped-defaults replicate so the r4 matrix has its own base
attr_arm bs4_default_r4 4
echo "=== Phase Z done $(date) ===" >> "$QL"
