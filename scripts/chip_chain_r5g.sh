#!/bin/bash
# Round-5 chain G: XLA compiler-flag matrix on the flagship 512px step.
#
# The only optimization axis never explored (grep: zero prior
# xla_tpu_* arms).  Each arm is one relay compile (~5-8 min) + 20 fenced
# steps at bs4 on shipped defaults; baseline 61.05 ms (chain C).
#   vmem32/vmem64  --xla_tpu_scoped_vmem_limit_kib: more VMEM budget per
#                  fusion can change conv fusion tiling decisions
#   rwb_off        --xla_tpu_rwb_fusion=false: reduce-window(+broadcast)
#                  fusion toggle — interacts with the 6.4 ms pool line
# Flags ride shell-level XLA_FLAGS (in-process env is too late: the
# image's sitecustomize imports jax at interpreter start).  Unknown-flag
# aborts just record an error row.  Resumable by tag.
set -u
cd /root/repo
LOG=/tmp/chipr5g
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
  git add "$OUT" && git commit -q -m "r5 chain G: arm $tag" || true
}

echo "=== chain R5G starting $(date) ===" >> "$QL"
run_arm xla_vmem32 env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768 \
  python scripts/attr_bench.py full --bs 4 --steps 20
run_arm xla_vmem64 env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
  python scripts/attr_bench.py full --bs 4 --steps 20
run_arm xla_rwb_off env XLA_FLAGS=--xla_tpu_rwb_fusion=false \
  python scripts/attr_bench.py full --bs 4 --steps 20
echo "=== chain R5G done $(date) ===" >> "$QL"
