#!/bin/bash
# Round-5 chain A2 (waits for chain A): the Pallas max-pool pair.
#   1. tiny-shape compile check on real Mosaic FIRST (round-2 lesson:
#      interpret mode does not model lane-offset stores / layout rules)
#   2. in-context arms bs4/bs8 on top of whatever chain A measured best
set -u
cd /root/repo
LOG=/tmp/chipr5a2
ART=docs/artifacts_r5/attr
QL="$LOG/queue.log"
mkdir -p "$LOG" "$ART"
echo "=== chain R5A2 starting $(date) ===" >> "$QL"

while [ -f /tmp/chipr5a.pid ] && ps -p "$(cat /tmp/chipr5a.pid)" >/dev/null 2>&1; do
  sleep 120
done
echo "=== chain A done, starting A2 $(date) ===" >> "$QL"

probe() {
  until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "probe: relay down $(date)" >> "$QL"
    sleep 180
  done
}

tagit() {
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
  git commit -q -m "r5 chain A2: $1" -- "$ART" >/dev/null 2>&1 || true
}

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

export TERRAIN_DTYPE=bf16

# ---- Phase A: real-Mosaic compile check, tiny + flagship pool shapes ----
if ! grep -q '"tag": "pool2_compilecheck"' "$ART/attr_results.jsonl" 2>/dev/null; then
  probe
  timeout 1800 python - > "$LOG/pool2_check.log" 2>&1 <<'EOF'
import json

import jax
import jax.numpy as jnp
import numpy as np

from terrain_tpu.ops.pallas import pool2

ok = {}
for shape in [(1, 8, 16, 8), (1, 16, 32, 64), (2, 64, 64, 64),
              (4, 512, 512, 64), (4, 16, 16, 256)]:
    try:
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
        n, h, w, c = shape
        cot = jnp.ones((n, h // 2, w // 2, c), jnp.bfloat16)
        y = jax.jit(pool2.max_pool2_pallas)(x)
        g = jax.jit(jax.grad(lambda a: jnp.sum(
            (pool2.max_pool2_pallas(a) * cot).astype(jnp.float32))))(x)
        from terrain_tpu.ops.pool import _reduce_window_max
        y_ref = _reduce_window_max(x, 2, 2)
        g_ref = jax.grad(lambda a: jnp.sum(
            (_reduce_window_max(a, 2, 2) * cot).astype(jnp.float32)))(x)
        fe = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                   - y_ref.astype(jnp.float32))))
        ge = float(jnp.max(jnp.abs(g.astype(jnp.float32)
                                   - g_ref.astype(jnp.float32))))
        ok[str(shape)] = {"fwd_maxerr": fe, "bwd_maxerr": ge}
    except Exception as e:  # noqa: BLE001
        ok[str(shape)] = {"error": str(e)[:300]}
print(json.dumps({"pool2_check": ok}))
EOF
  tagit "$LOG/pool2_check.log" pool2_compilecheck
  land_jsonl "pool2 Mosaic compile check"
fi

# ---- Phase B: in-context arms ----
attr_arm bs4_poolpallas 4 TERRAIN_POOL_VJP=pallas
attr_arm bs8_poolpallas 8 TERRAIN_POOL_VJP=pallas
# pair with the stem-planes knob (chain A measures it alone)
attr_arm bs4_poolpallas_stemplanes 4 TERRAIN_POOL_VJP=pallas \
  TERRAIN_STEM_PLANES=bf16
echo "=== chain R5A2 done $(date) ===" >> "$QL"
