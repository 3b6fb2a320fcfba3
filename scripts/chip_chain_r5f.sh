#!/bin/bash
# Round-5 chain F: bs=16 arms for the flagship 512px step.
#
# bs16 has never been measured (bench best_bs=8 at 67.15 imgs/s =
# 119.1 ms/step; bs16 wins if step_ms < 238).  Arms ride shipped
# defaults; stemplanes=bf16 added because its only win so far is at the
# larger batch (RESULTS_r5 §3, -1.4 ms at bs8).  conv_thin auto-gates
# off at n>4.  Resumable: completed tags are skipped on re-run.
set -u
cd /root/repo
LOG=/tmp/chipr5f
OUT=docs/artifacts_r5/attr/attr_results.jsonl
QL=$LOG/queue.log
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 60
  done
}

run_arm () {  # $1 tag, rest = command
  local tag=$1; shift
  grep -q "\"tag\": \"$tag\"" "$OUT" 2>/dev/null && return 0
  probe
  echo "=== arm $tag $(date) ===" >> "$QL"
  if timeout 2400 "$@" > "$LOG/attr_$tag.log" 2>&1; then
    tail -1 "$LOG/attr_$tag.log" | grep '^{' | \
      sed "s/^{/{\"tag\": \"$tag\", /" >> "$OUT" || \
      echo "{\"tag\": \"$tag\", \"error\": \"no json\"}" >> "$OUT"
  else
    echo "arm failed ($tag, $(date))" >> "$QL"
    echo "{\"tag\": \"$tag\", \"error\": true}" >> "$OUT"
  fi
  git add "$OUT" && git commit -q -m "r5 chain F: arm $tag" || true
}

echo "=== chain R5F starting $(date) ===" >> "$QL"
run_arm bs16_base python scripts/attr_bench.py full --bs 16 --steps 20
run_arm bs16_stemplanes env TERRAIN_STEM_PLANES=bf16 \
  python scripts/attr_bench.py full --bs 16 --steps 20
echo "=== chain R5F done $(date) ===" >> "$QL"
