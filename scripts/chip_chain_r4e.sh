#!/bin/bash
# Round-4 chain E: post-D cleanup pass.
#   1. waits for chain D's process to exit (one TPU process at a time);
#   2. re-runs chain D — every phase is artifact-guarded, so this retries
#      ONLY arms that failed silently (e.g. serve512_png, whose failure
#      row was never written: D's tagit `|| echo` bound to sed's exit
#      status, so grep-miss never triggered the fallback);
#   3. runs the extra arms below with the fixed tagit.
set -u
cd /root/repo
LOG=/tmp/chipr4e
ART=docs/artifacts_r4/attr
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART"
echo "=== chain R4E starting $(date) ===" >> "$QL"

# ---- wait for chain D ----
DPID=$(cat /tmp/chipr4d.pid 2>/dev/null || echo "")
if [ -n "$DPID" ]; then
  while kill -0 "$DPID" 2>/dev/null; do sleep 60; done
fi
echo "=== chain D exited $(date) ===" >> "$QL"

# ---- idempotent retry of D's guarded arms ----
bash scripts/chip_chain_r4d.sh
echo "=== chain D retry pass done $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
}

tagit() {  # fixed: test the grep, not sed's always-0 exit
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
  git commit -q -m "r4 chain E: $1" -- "$ART" >/dev/null 2>&1 || true
}

export TERRAIN_DTYPE=bf16

# serve512_png with the server log captured (bench_serve.py now writes it);
# commit the server log alongside if the arm fails again
if ! grep -q '"tag": "serve512_png"' "$ART/attr_results.jsonl" 2>/dev/null; then
  probe
  TERRAIN_SERVE_LOG="$LOG/serve512_png_srv.log" timeout 3600 \
    python scripts/bench_serve.py \
    --experiment test1_nobn_bilin_both_stable --clients 4 --requests 40 \
    --max-batch 4 --enc png > "$LOG/serve_serve512_png.log" 2>&1
  tagit "$LOG/serve_serve512_png.log" serve512_png
  if grep -q '"error": true' <(tail -1 "$LOG/attr_results.jsonl"); then
    cp "$LOG/serve512_png_srv.log" "$ART/serve512_png_srv_fail.log" \
      2>/dev/null || true
  fi
  land_jsonl "serve serve512_png (qfetch default, re-run)"
fi
echo "=== chain R4E done $(date) ===" >> "$QL"
