#!/usr/bin/env bash
# TPU launch script — the reference's experiment.5.sh equivalent (it set
# THEANO_FLAGS: device, float32, fastmath, cuDNN autotune).  Here the knobs
# are JAX/XLA env vars + terrain_tpu's TERRAIN_* runtime config.
#
# Usage: scripts/experiment_tpu.sh <experiment> <mode>
set -euo pipefail

# bf16 compute on the MXU (fp32 params/accumulation)
export TERRAIN_DTYPE="${TERRAIN_DTYPE:-bf16}"
# device-resident uint8 dataset + in-graph gather/normalize/augment
export TERRAIN_FAST="${TERRAIN_FAST:-1}"
# persistent XLA compilation cache — first compile of the 4-network 512px
# step is ~minutes, subsequent launches are seconds
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"
# k train steps per dispatch via lax.scan (63.7 vs 65.8 ms/step measured,
# docs/RESULTS_r3.md; numerics identical to per-step — tests/test_scan_step.py)
export TERRAIN_SCAN="${TERRAIN_SCAN:-16}"
# async dispatch depth; leave XLA fusion defaults alone (they're right)
export JAX_TRACEBACK_FILTERING=off

exec python -m terrain_tpu "$@"
