#!/bin/bash
# Round-4 chain C: perf depth (VERDICT r3 items 2, 5, 6).  Runs after
# chain B frees the chip.
#
# Phase A — composition traces: device trace of thin_on (shipped), base
#           (thin off), s2thin — the trace DIFF explains why conv_s2 and
#           ACT_BWD win alone but lose with conv_thin (chain P pathology).
# Phase B — bs=8 kernel matrix (BENCH best_bs) + tile-constant A/Bs
#           (TERRAIN_THIN_TH, TERRAIN_STEM_TH): every round-3 tile was
#           tuned at bs=4 only.
# Phase C — serve wire-format A/B at 512px: npy vs png vs png+qfetch-off
#           (the round-3 gap: the native PNG encoder was built for this
#           and never measured end-to-end).
# Phase D — bench_gen (+png wire arm), north-star recipe, final bench.py
#           (also warms .jax_cache for the driver's end-of-round bench).
set -u
cd /root/repo
LOG=/tmp/chipr4c
ART=docs/artifacts_r4/attr
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART"
echo "=== chain R4C queued $(date) ===" >> "$QL"

PID=$(cat /tmp/chipr4b.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
echo "=== chain R4C starting $(date) ===" >> "$QL"

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
  git commit -q -m "r4 chain C: $1" -- "$ART" >/dev/null 2>&1 || true
}

tagit() {
  tail -1 "$1" | grep '^{' | sed "s/^{/{\"tag\": \"$2\", /" \
    >> "$LOG/attr_results.jsonl" || \
    echo "{\"tag\": \"$2\", \"error\": true}" >> "$LOG/attr_results.jsonl"
}

export TERRAIN_DTYPE=bf16

# ---- Phase A0: clean AOT arm re-runs (chain A's no_store arm shared the
# core with a test suite; these re-run on the idle post-B host.  The relay
# server cache is long-warm for rows=248 by now, which is exactly the
# no_store arm's intended semantics.) ----
run "$LOG/aot_no_store2.log" 3600 python scripts/aot_coldstart.py \
  --rows 248 --xla-cache "$LOG/xa"
tagit "$LOG/aot_no_store2.log" aot_no_store_rerun
if [ -d /tmp/chipr4a/aot_store ]; then
  timeout 3600 python scripts/aot_coldstart.py --rows 248 \
    --aot /tmp/chipr4a/aot_store --xla-cache "$LOG/xc" \
    > "$LOG/aot_with_store2.log" 2>&1 || true
  tagit "$LOG/aot_with_store2.log" aot_with_store_rerun
fi
land_jsonl "AOT re-run arms"

# serve bucket-ladder AOT A/B (chain A's serve arms died to the shutdown()
# hang + the chip collision; store dir reset so populate is honest)
rm -rf "$LOG/serve_store" "$LOG/xs1" "$LOG/xs2"
TERRAIN_AOT="$LOG/serve_store" run "$LOG/serve_pop.log" 5400 \
  python scripts/aot_serve_warmup.py --xla-cache "$LOG/xs1"
tagit "$LOG/serve_pop.log" serve_populate
TERRAIN_AOT="$LOG/serve_store" run "$LOG/serve_store.log" 5400 \
  python scripts/aot_serve_warmup.py --xla-cache "$LOG/xs2"
tagit "$LOG/serve_store.log" serve_with_store
land_jsonl "serve AOT arms"
echo "=== Phase A0 done $(date) ===" >> "$QL"

# ---- Phase A: composition traces ----
trace_arm() {
  local name="$1"; shift
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
    git commit -q -m "r4 chain C: device trace $name (composition diff)" \
      -- "$ART" >/dev/null 2>&1 || true
  fi
  echo "=== trace $name done $(date) ===" >> "$QL"
}
trace_arm thin
trace_arm base   TERRAIN_PALLAS_THIN=0
trace_arm s2thin TERRAIN_PALLAS_CONVS2=1

# ---- Phase B: bs=8 matrix + tile A/Bs ----
attr_arm() {
  local tag="$1" bs="$2"; shift 2
  ( for kv in "$@"; do export "${kv?}"; done
    probe
    timeout 3000 python scripts/attr_bench.py full --bs "$bs" \
      > "$LOG/attr_$tag.log" 2>&1 )
  tagit "$LOG/attr_$tag.log" "$tag"
  land_jsonl "arm $tag"
  echo "=== attr $tag done $(date) ===" >> "$QL"
}
attr_arm bs8_default 8
attr_arm bs8_thin_off 8 TERRAIN_PALLAS_THIN=0
attr_arm bs8_s2thin 8 TERRAIN_PALLAS_CONVS2=1
attr_arm bs8_actbwd 8 TERRAIN_ACT_BWD=1
attr_arm bs8_thin_th8 8 TERRAIN_THIN_TH=8
attr_arm bs8_thin_th32 8 TERRAIN_THIN_TH=32
attr_arm bs8_stem_th16 8 TERRAIN_STEM_TH=16
attr_arm bs4_thin_th8 4 TERRAIN_THIN_TH=8
attr_arm bs4_thin_th32 4 TERRAIN_THIN_TH=32
# the hole in the chain-P matrix: thin+actbwd WITHOUT s2 was never
# measured (actbwd_on ran in stem context, all_on included s2) — if the
# wins compose, this is 63.4 - 0.8 ~= 62.6 ms
attr_arm bs4_thin_actbwd 4 TERRAIN_ACT_BWD=1

# ---- Phase C: 512px serve wire-format A/B ----
for enc in npy png; do
  run "$LOG/serve512_$enc.log" 3600 python scripts/bench_serve.py \
    --experiment test1_nobn_bilin_both_stable --clients 4 --requests 40 \
    --max-batch 4 --enc "$enc"
  tagit "$LOG/serve512_$enc.log" "serve512_$enc"
  land_jsonl "serve512 $enc"
  echo "=== serve $enc done $(date) ===" >> "$QL"
done
TERRAIN_SERVE_QFETCH=0 run "$LOG/serve512_png_noqfetch.log" 3600 \
  python scripts/bench_serve.py \
  --experiment test1_nobn_bilin_both_stable --clients 4 --requests 40 \
  --max-batch 4 --enc png
tagit "$LOG/serve512_png_noqfetch.log" serve512_png_noqfetch
land_jsonl "serve512 png noqfetch"

# ---- Phase D: gen throughput, north-star, final bench ----
run "$LOG/bench_gen.log" 3600 python scripts/bench_gen.py --bs 4 8 --enc png
tagit "$LOG/bench_gen.log" bench_gen_r4
land_jsonl "bench_gen"

run "$LOG/northstar_bs4.log" 3000 python scripts/northstar.py --bs 4 --scan-k 15
tagit "$LOG/northstar_bs4.log" northstar_bs4
run "$LOG/northstar_bs8.log" 3000 python scripts/northstar.py --bs 8 --scan-k 15
tagit "$LOG/northstar_bs8.log" northstar_bs8
land_jsonl "northstar"

run "$LOG/bench_final.log" 3600 python bench.py
tagit "$LOG/bench_final.log" bench_r4
land_jsonl "final bench"
echo "=== chain R4C done $(date) ===" >> "$QL"
