#!/bin/bash
# Quality regression gate: TWO short training runs (independent seeds) on
# the PINNED 512×256 synthetic scene; the MEDIAN of their held-out PSNRs
# must stay within 0.5 dB of the value measured on known-good code.
#
# Round-5 hardening (VERDICT r4 next-round #7): the r4 gate used a single
# run with a 1.0 dB margin while measured run-to-run training noise was
# already ~0.3 dB — a real ~0.6 dB regression (the size the r4 reduction
# bug would have caused on rotation-heavy scenes) passed undetected.
# Gating the median of two independent-seed runs halves the noise;
# measured on current code (chip, r5): seed0 16.95, seed1 17.18,
# seed2 17.07 → mean 17.07, spread 0.23 dB. Bar = GATE_PSNR − 0.5.
#
#   Pinned scene:    make_synthetic_scene --seed 1234 (512×256, 12 train /
#                    4 test views, deg-3 view-dependent GT)
#   Measured value:  GATE_PSNR below (chip measurements, BENCH.md r5)
#   Bar:             GATE_PSNR − 0.5 dB on the median of 2 runs
#
# An UNPINNED scene (explicit SCENE_DIR arg) falls back to the collapse
# floor 15.0 — absolute PSNR is scene-dependent; the authoritative quality
# evidence is the full protocol run (results/protocol_r5).
# Usage: quality_check.sh [SCENE_DIR] [OUT_DIR]
set -u -o pipefail
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jaxcache}
# mean held-out PSNR of the pinned scene @1.5k iters over 3 seeds,
# measured on chip on round-5 code (segmented kernels; BENCH.md r5)
GATE_PSNR=17.07
SCENE=${1:-/tmp/qscene_pinned}
OUT=${2:-/tmp/quality_check}
if [ $# -ge 1 ] || [ "$GATE_PSNR" = 0 ]; then
  BAR=15.0
else
  BAR=$(python -c "print($GATE_PSNR - 0.5)")
fi
cd /root/repo
[ -d "$SCENE" ] || { python scripts/cpu_run.py scripts/make_synthetic_scene.py "$SCENE" --seed 1234; }
dirs=""
for seed in 1 2; do
  RUN="$OUT/run$seed"
  rm -rf "$RUN"; mkdir -p "$RUN"
  python examples/train_openmvg_lonlat.py cfg/lonlat/synthetic_medium.yaml \
    "$RUN" "$SCENE/sfm_data_train.json" "$SCENE/points.ply" \
    --image-root "$SCENE/images" --iters 1500 --log-every 500 \
    --seed $seed 2>&1 | tee "$RUN/train.log"
  ply=$(ls -d "$RUN"/*/ply/point_cloud.ply 2>/dev/null | tail -1)
  python examples/test_openmvg_lonlat.py cfg/lonlat/synthetic_medium.yaml \
    "$RUN/test" "$SCENE/sfm_data_test.json" "$ply" 2>&1 | tee "$RUN/test.log"
  dirs="$dirs $RUN/test"
done
python scripts/psnr_gate.py "$BAR" $dirs
