#!/bin/bash
# Quality regression gate: short training on the PINNED 512×256 synthetic
# scene (seed 1234 — regenerated deterministically, so the measured bar is
# scene-stable across machines) must reach held-out PSNR within 1 dB of the
# value measured on known-good code (VERDICT r3 weak #2: a floating bar of
# 15 would pass a halved-PSNR regression).
#
#   Pinned scene:    make_synthetic_scene --seed 1234 (512×256, 12 train /
#                    4 test views, deg-3 view-dependent GT)
#   Measured value:  see GATE_PSNR below (chip measurement, BENCH.md r4)
#   Bar:             GATE_PSNR − 1.0 dB
#
# An UNPINNED scene (explicit SCENE_DIR arg) falls back to the collapse
# floor 15.0 — absolute PSNR is scene-dependent; the authoritative quality
# evidence is the full protocol run (results/protocol_r4).
# Usage: quality_check.sh [SCENE_DIR] [OUT_DIR]
set -u -o pipefail
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
# held-out PSNR of the pinned scene @1.5k iters, measured on chip on
# known-good code (round-4 defaults: gather_reduce + depth_presort +
# two-level reduction; sprint3 2026-08, /tmp/sprint_r4/quality.log);
# 0 = not yet measured on this code line → collapse floor
GATE_PSNR=17.38
SCENE=${1:-/tmp/qscene_pinned}
OUT=${2:-/tmp/quality_check}
if [ $# -ge 1 ] || [ "$GATE_PSNR" = 0 ]; then
  BAR=15.0
else
  BAR=$(python -c "print($GATE_PSNR - 1.0)")
fi
cd /root/repo
[ -d "$SCENE" ] || { python scripts/cpu_run.py scripts/make_synthetic_scene.py "$SCENE" --seed 1234; }
rm -rf "$OUT"; mkdir -p "$OUT"
python examples/train_openmvg_lonlat.py cfg/lonlat/synthetic_medium.yaml \
  "$OUT" "$SCENE/sfm_data_train.json" "$SCENE/points.ply" \
  --image-root "$SCENE/images" --iters 1500 --log-every 500 2>&1 | tee "$OUT/train.log"
ply=$(ls -d "$OUT"/*/ply/point_cloud.ply 2>/dev/null | tail -1)
python examples/test_openmvg_lonlat.py cfg/lonlat/synthetic_medium.yaml \
  "$OUT/test" "$SCENE/sfm_data_test.json" "$ply" 2>&1 | tee "$OUT/test.log"
python scripts/psnr_gate.py "$OUT/test" "$BAR"
