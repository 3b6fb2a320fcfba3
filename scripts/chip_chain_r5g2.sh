#!/bin/bash
# Round-5 chain G2: XLA compiler-option matrix, take 2.
#
# Chain G died instantly: shell-level XLA_FLAGS with xla_tpu_* aborts the
# LOCAL process (no TPU compiler; parse_flags_from_env rejects unknown
# flags).  Take 2 ships options to the REMOTE compiler via
# lower().compile(compiler_options=...) (attr_bench TERRAIN_XLA_OPTS) —
# probe-verified: bogus values fail remotely, so options genuinely apply.
# The XLA compile cache does NOT key on options -> fresh cache dir per
# arm (each arm pays a true cold flagship compile, 5-20 min on today's
# relay).  Baseline 61.05 ms bs4 shipped defaults.
set -u
cd /root/repo
LOG=/tmp/chipr5g2
OUT=docs/artifacts_r5/attr/attr_results.jsonl
QL=$LOG/queue.log
mkdir -p "$LOG"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 60
  done
}

run_arm () {  # $1 tag, $2 opts-string
  local tag=$1 opts=$2
  grep -q "\"tag\": \"$tag\"" "$OUT" 2>/dev/null && return 0
  probe
  echo "=== arm $tag ($opts) $(date) ===" >> "$QL"
  if timeout 3600 env TERRAIN_XLA_OPTS="$opts" \
       JAX_COMPILATION_CACHE_DIR="/tmp/flagcache_$tag" \
       python scripts/attr_bench.py full --bs 4 --steps 20 \
       > "$LOG/attr_$tag.log" 2>&1; then
    tail -1 "$LOG/attr_$tag.log" | grep '^{' | \
      sed "s/^{/{\"tag\": \"$tag\", /" >> "$OUT" || \
      echo "{\"tag\": \"$tag\", \"error\": \"no json\"}" >> "$OUT"
  else
    echo "arm failed ($tag, $(date))" >> "$QL"
    echo "{\"tag\": \"$tag\", \"error\": true}" >> "$OUT"
  fi
  git add "$OUT" && git commit -q -m "r5 chain G2: arm $tag" || true
}

echo "=== chain R5G2 starting $(date) ===" >> "$QL"
# control through the same fresh-cache compile path (isolates any cost of
# the lower/compile route itself from the option effects)
run_arm xopt_control ""
run_arm xopt_vmem32 "xla_tpu_scoped_vmem_limit_kib=32768"
run_arm xopt_vmem64 "xla_tpu_scoped_vmem_limit_kib=65536"
run_arm xopt_rwb_off "xla_tpu_rwb_fusion=false"
echo "=== chain R5G2 done $(date) ===" >> "$QL"
