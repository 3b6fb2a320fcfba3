#!/bin/bash
# North-star recipe, reproducible (VERDICT r3 item 7): measured
# 600-epoch-equivalent wall-clock under the shipped knobs.
#   bs=4 (reference parity) and bs=8 (best measured config, BENCH best_*).
# Requires the TPU relay; programs are the same shapes bench.py compiles,
# so a warm .jax_cache makes this take ~a minute.
set -u
cd "$(dirname "$0")/.."
export TERRAIN_DTYPE=bf16
python scripts/northstar.py --bs 4 --scan-k 15
python scripts/northstar.py --bs 8 --scan-k 15
