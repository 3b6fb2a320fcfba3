#!/bin/bash
# Round-4 chain B: quality evidence through the SHIPPED kernel defaults
# (VERDICT r3 items 1 + 3).  Starts after chain A (AOT) frees the chip.
#
# Phase 1 — rebuild data/earth256.h5 (host re-provision wiped data/).
# Phase 2 — earth256_stable 600 epochs with the shipped defaults (conv_thin
#           ON since chain P; the committed round-3 run trained BEFORE that
#           flip) -> docs/artifacts_r4/earth256_stable_shipped, directly
#           comparable to docs/artifacts_r3/earth256_stable.
# Phase 3 — earth256_finetunep2p end-to-end (train -> 100-sample interp
#           clip -> gen sheet): the reference's publication workflow on
#           real data, the committed-evidence gap from round 3.
# Phase 4 — 512px BOTH-mode A/B: shipped defaults vs TERRAIN_PALLAS_CONV=0
#           (kernels off), 600 epochs each on identical synthetic data —
#           the DCGAN generator's backward flows through the conv_thin
#           Pallas dW only in both-mode, which no committed 512px
#           trajectory has ever exercised.
#
# Artifacts are packed AND COMMITTED after every arm (two round-3 chains
# died to host re-provisions with uncommitted results).
set -u
cd /root/repo
LOG=/tmp/chipr4b
QL="$LOG/queue.log"
mkdir -p "$LOG" data
echo "=== chain R4B queued $(date) ===" >> "$QL"

# wait for chain A to free the chip
PID=$(cat /tmp/chipr4a.pid 2>/dev/null || true)
if [ -n "${PID}" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
echo "=== chain R4B starting $(date) ===" >> "$QL"

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

land() {  # land <output_dir> <artifact_name> <msg>
  python tools/pack_artifacts.py "$1" "docs/artifacts_r4/$2" \
    >> "$QL" 2>&1 || true
  git add "docs/artifacts_r4/$2" >/dev/null 2>&1 || true
  git commit -q -m "r4 chain B: $3" -- "docs/artifacts_r4/$2" \
    >/dev/null 2>&1 || true
}

export TERRAIN_DTYPE=bf16

# ---- Phase 1: dataset ----
if [ ! -f data/earth256.h5 ]; then
  run "$LOG/build_ds.log" 1800 python tools/build_dataset.py \
    --heightmap /root/reference/md/earth_heightmap.png \
    --texture /root/reference/md/earth_texture.jpg \
    --out data/earth256.h5 --crop 256 --stride 16
  echo "=== dataset built $(date) ===" >> "$QL"
fi

# ---- Phase 2: earth256_stable through the shipped kernels ----
export TERRAIN_SCAN=15 TERRAIN_SWD=1 TERRAIN_SAVE_EVERY=50 TERRAIN_RESUME=auto
run "$LOG/e256_train.log" 7200 python -m terrain_tpu earth256_stable train
python tools/summarize_run.py output/earth256_stable \
  > "$LOG/e256_summary.txt" 2>&1 || true
mkdir -p docs/artifacts_r4/earth256_stable_shipped
cp "$LOG/e256_summary.txt" docs/artifacts_r4/earth256_stable_shipped/summary.txt 2>/dev/null || true
land output/earth256_stable earth256_stable_shipped \
  "earth256_stable 600ep through shipped kernel defaults"
echo "=== earth256_stable done $(date) ===" >> "$QL"

# ---- Phase 3: earth256_finetunep2p end-to-end ----
run "$LOG/e256ft_train.log" 7200 python -m terrain_tpu earth256_finetunep2p train
python tools/summarize_run.py output/earth256_finetunep2p \
  > "$LOG/e256ft_summary.txt" 2>&1 || true
mkdir -p docs/artifacts_r4/earth256_finetunep2p
cp "$LOG/e256ft_summary.txt" docs/artifacts_r4/earth256_finetunep2p/summary.txt 2>/dev/null || true
land output/earth256_finetunep2p earth256_finetunep2p \
  "earth256_finetunep2p 600ep train lands"
echo "=== finetune train done $(date) ===" >> "$QL"

unset TERRAIN_SCAN TERRAIN_RESUME
run "$LOG/e256ft_interp.log" 5400 python -m terrain_tpu earth256_finetunep2p interp
python tools/make_filmstrip.py \
  output/earth256_finetunep2p/interp_clip_concat_bothdet \
  docs/artifacts_r4/earth256_finetunep2p/interp_filmstrip.png --k 8 \
  >> "$QL" 2>&1 || true
git add docs/artifacts_r4/earth256_finetunep2p >/dev/null 2>&1 || true
git commit -q -m "r4 chain B: earth256_finetunep2p 100-sample interp clip filmstrip" \
  -- docs/artifacts_r4/earth256_finetunep2p >/dev/null 2>&1 || true
echo "=== finetune interp done $(date) ===" >> "$QL"

run "$LOG/e256ft_gen.log" 2400 python -m terrain_tpu earth256_finetunep2p gen
python - <<'EOF' >> "$QL" 2>&1 || true
import glob, numpy as np
from imageio.v3 import imread, imwrite
files = sorted(glob.glob("output/earth256_finetunep2p/gen/*.png"))[:25]
if files:
    imgs = [imread(f) for f in files]
    h, w = imgs[0].shape[:2]
    sheet = np.zeros((5 * h, 5 * w) + imgs[0].shape[2:], imgs[0].dtype)
    for i, im in enumerate(imgs):
        r, c = divmod(i, 5)
        sheet[r*h:(r+1)*h, c*w:(c+1)*w] = im
    imwrite("docs/artifacts_r4/earth256_finetunep2p/gen_600_sheet.png", sheet)
    print("gen sheet: %d tiles" % len(imgs))
EOF
git add docs/artifacts_r4/earth256_finetunep2p >/dev/null 2>&1 || true
git commit -q -m "r4 chain B: earth256_finetunep2p gen sheet" \
  -- docs/artifacts_r4/earth256_finetunep2p >/dev/null 2>&1 || true
echo "=== Phase 3 done $(date) ===" >> "$QL"

# ---- Phase 4: 512px both-mode shipped-vs-kernels-off trajectories ----
export TERRAIN_SYNTHETIC=1 TERRAIN_FAST=1 TERRAIN_SCAN=15 TERRAIN_SWD=1 \
       TERRAIN_EPOCHS=600 TERRAIN_SAVE_EVERY=100 TERRAIN_RESUME=auto \
       TERRAIN_ARTIFACT_EVERY=25
run "$LOG/s512_shipped.log" 14400 \
  python -m terrain_tpu test1_nobn_bilin_both_stable train
python tools/summarize_run.py output/test1_nobn_bilin_both_stable \
  > "$LOG/s512_shipped_summary.txt" 2>&1 || true
mkdir -p docs/artifacts_r4/stable512_shipped
cp "$LOG/s512_shipped_summary.txt" docs/artifacts_r4/stable512_shipped/summary.txt 2>/dev/null || true
land output/test1_nobn_bilin_both_stable stable512_shipped \
  "512px both-mode 600ep through shipped kernel defaults"
echo "=== 512 shipped arm done $(date) ===" >> "$QL"

TERRAIN_PALLAS_CONV=0 TERRAIN_OUT=output_koff TERRAIN_MODELS=models_koff \
  run "$LOG/s512_koff.log" 14400 \
  python -m terrain_tpu test1_nobn_bilin_both_stable train
python tools/summarize_run.py output_koff/test1_nobn_bilin_both_stable \
  > "$LOG/s512_koff_summary.txt" 2>&1 || true
mkdir -p docs/artifacts_r4/stable512_kernels_off
cp "$LOG/s512_koff_summary.txt" docs/artifacts_r4/stable512_kernels_off/summary.txt 2>/dev/null || true
land output_koff/test1_nobn_bilin_both_stable stable512_kernels_off \
  "512px both-mode 600ep kernels-off control arm"
echo "=== chain R4B done $(date) ===" >> "$QL"
