#!/bin/bash
# Round-5 chain D: waits for chain C, then re-measures the one arm chain C
# dedupe-skipped: bs8_s2 (its first run landed only an {"error": true} row
# and the pre-reprovision /tmp log died; attr_arm's resume grep matches
# error rows too, so the retry never ran).  Drops the error row first so
# the landing dedupe in tools/land_chip_results.py keeps the fresh number.
set -u
cd /root/repo
LOG=/tmp/chipr5d
ART=docs/artifacts_r5/attr
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART"
echo "=== chain R5D starting $(date) ===" >> "$QL"

while [ -f /tmp/chipr5c.pid ] && ps -p "$(cat /tmp/chipr5c.pid)" \
    >/dev/null 2>&1; do
  sleep 120
done
echo "=== chain C done, starting D $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
}

if grep -q '"tag": "bs8_s2", "error"' "$ART/attr_results.jsonl" 2>/dev/null; then
  grep -v '"tag": "bs8_s2", "error"' "$ART/attr_results.jsonl" \
    > "$ART/attr_results.jsonl.tmp" \
    && mv "$ART/attr_results.jsonl.tmp" "$ART/attr_results.jsonl"
fi

if ! grep -q '"tag": "bs8_s2"' "$ART/attr_results.jsonl" 2>/dev/null; then
  ( export TERRAIN_DTYPE=bf16 TERRAIN_PALLAS_CONVS2=1
    probe
    timeout 3000 python scripts/attr_bench.py full --bs 8 \
      > "$LOG/attr_bs8_s2.log" 2>&1 )
  line=$(tail -1 "$LOG/attr_bs8_s2.log" | grep '^{' || true)
  if [ -n "$line" ]; then
    echo "$line" | sed 's/^{/{"tag": "bs8_s2", /' >> "$ART/attr_results.jsonl"
  else
    echo '{"tag": "bs8_s2", "error": true}' >> "$ART/attr_results.jsonl"
    tail -40 "$LOG/attr_bs8_s2.log" > "$ART/err_bs8_s2.txt" 2>/dev/null || true
    git add "$ART/err_bs8_s2.txt" >/dev/null 2>&1 || true
  fi
  git add "$ART" >/dev/null 2>&1 || true
  git commit -q -m "r5 chain D: bs8_s2 re-measured" -- "$ART" \
    >/dev/null 2>&1 || true
fi
echo "=== chain R5D done $(date) ===" >> "$QL"
