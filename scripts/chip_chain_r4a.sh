#!/bin/bash
# Round-4 chain A: the CLEAN AOT cold-start A/B (VERDICT r3 item 4).
#
# Preconditions this chain is designed around:
#   * IDLE host — nothing else may share the single core (the round-3
#     measurement was contaminated by a concurrent test suite);
#   * the relay's server-side compile cache cannot be cleared, so the
#     train-step arms use --rows 248 (a row count no prior process ever
#     used; shapes key the cache) to make the program GENUINELY novel;
#   * every arm is a fresh process with its own EMPTY local XLA cache dir.
#
# Arms, in order:
#   1. populate   — novel program, no store, saves the AOT store
#                   (= TRUE cold compile; relay cache cold for these shapes)
#   2. with_store — same program, fresh process, empty XLA cache, AOT store
#                   (= the headline "cold-start in seconds" claim)
#   3. no_store   — same program again, no store (relay server cache now
#                   WARM for it: reported as the relay-warm recompile arm,
#                   the round-3 caveat made explicit)
#   4. serve_populate   — 512px serve bucket ladder (max-batch 4, qfetch
#                         off: buckets 1/2/4 x {two_stage, atob}), saving
#                         the store
#   5. serve_with_store — same ladder from the store
#
# Results JSONL: $LOG/aot_results.jsonl, mirrored+committed after EVERY arm
# (two round-3 chains died to host re-provisions with uncommitted results).
set -u
cd /root/repo
LOG=/tmp/chipr4a
ART=docs/artifacts_r4/aot
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART"
echo "=== chain R4A starting $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
  echo "probe: relay live $(date)" >> "$QL"
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

tagit() {  # append the arm's JSON line, tagged, and commit the mirror
  tail -5 "$1" | grep '^{' | tail -1 | sed "s/^{/{\"tag\": \"$2\", /" \
    >> "$LOG/aot_results.jsonl" || true
  cp "$LOG/aot_results.jsonl" "$ART/aot_results.jsonl" 2>/dev/null || true
  git add "$ART" >/dev/null 2>&1 || true
  git commit -q -m "r4 chain A: arm $2 lands (AOT cold-start A/B)" \
    -- "$ART" >/dev/null 2>&1 || true
}

export TERRAIN_DTYPE=bf16
STORE="$LOG/aot_store"
SSTORE="$LOG/aot_store_serve"
ROWS=248

run "$LOG/populate.log" 3600 python scripts/aot_coldstart.py \
  --rows $ROWS --aot "$STORE" --xla-cache "$LOG/x1"
tagit "$LOG/populate.log" populate
echo "=== arm populate done $(date) ===" >> "$QL"

run "$LOG/with_store.log" 3600 python scripts/aot_coldstart.py \
  --rows $ROWS --aot "$STORE" --xla-cache "$LOG/x2"
tagit "$LOG/with_store.log" with_store
echo "=== arm with_store done $(date) ===" >> "$QL"

run "$LOG/no_store.log" 3600 python scripts/aot_coldstart.py \
  --rows $ROWS --xla-cache "$LOG/x3"
tagit "$LOG/no_store.log" no_store_relay_warm
echo "=== arm no_store done $(date) ===" >> "$QL"

TERRAIN_AOT="$SSTORE" run "$LOG/serve_pop.log" 5400 \
  python scripts/aot_serve_warmup.py --xla-cache "$LOG/x4"
tagit "$LOG/serve_pop.log" serve_populate
echo "=== arm serve_populate done $(date) ===" >> "$QL"

TERRAIN_AOT="$SSTORE" run "$LOG/serve_store.log" 5400 \
  python scripts/aot_serve_warmup.py --xla-cache "$LOG/x5"
tagit "$LOG/serve_store.log" serve_with_store
echo "=== chain R4A done $(date) ===" >> "$QL"
