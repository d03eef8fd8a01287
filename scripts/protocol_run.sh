#!/bin/bash
# Full reference protocol on the self-contained full-res synthetic scene
# (scripts/360roam_run.py:22-34 analog): train 32010 iters with eval/ckpt
# every 8000, then held-out test eval at 8000 and 32000.
# Usage: protocol_run.sh SCENE_DIR RESULT_DIR [EXTRA_TRAIN_ARGS...]
#
# Scene generation is PINNED (round 4 — earlier rounds did not record it
# and the r3/r4 scene draws are unrecoverable; results/protocol_r4f
# onward use exactly):
#   python scripts/cpu_run.py scripts/make_synthetic_scene.py \
#     /root/scene_fullres --width 1920 --height 960 --gaussians 32768 \
#     --train-views 16      # (seed 0 → 16533 seed points)
set -u -o pipefail
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jaxcache}
SCENE=${1:-/root/repo/results_local/scene_fullres}
OUT=${2:-/root/repo/results_local/proto_out}
[ $# -ge 1 ] && shift
[ $# -ge 1 ] && shift
# PY override runs the entry points through a launcher (e.g.
# "python scripts/cpu_run.py" for host-side shakeout while the chip is busy).
PY=${PY:-python}
CFG=${CFG:-cfg/lonlat/synthetic_protocol.yaml}
cd /root/repo
mkdir -p "$OUT"
$PY examples/train_openmvg_lonlat.py \
  "$CFG" "$OUT" \
  "$SCENE/sfm_data_train.json" "$SCENE/points.ply" \
  --image-root "$SCENE/images" "$@" 2>&1 | tee -a "$OUT/train.log"
rc=$?
echo "[protocol] train rc=$rc"
for it in 8000 32000; do
  ply="$OUT/$it/ply/point_cloud.ply"
  [ -f "$ply" ] || ply=$(ls -d "$OUT"/*"$it"*/ply/point_cloud.ply 2>/dev/null | head -1)
  if [ -f "$ply" ]; then
    $PY examples/test_openmvg_lonlat.py \
      "$CFG" "$OUT/${it}_test" \
      "$SCENE/sfm_data_test.json" "$ply" 2>&1 | tee -a "$OUT/test_${it}.log"
    echo "[protocol] test@$it rc=$?"
  else
    echo "[protocol] no checkpoint for iter $it"
  fi
done
