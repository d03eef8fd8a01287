#!/bin/bash
# Quality smoke gate: short training on a 512×256 synthetic scene must not
# collapse (held-out PSNR floor 15 @1.5k iters — a randomly generated
# 12-view scene with deg-3 view-dependent GT measured 16.9 held-out /
# ~25 train at this budget, so the absolute number is scene-dependent; the
# authoritative quality evidence is the full protocol run's trajectory,
# results/protocol_r3). Run on chip after kernel/binning changes.
# Usage: quality_check.sh [SCENE_DIR] [OUT_DIR]
set -u -o pipefail
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
SCENE=${1:-/tmp/qscene}   # default: fresh 512×256 scene (the r1 bar's shape)
OUT=${2:-/tmp/quality_check}
cd /root/repo
[ -d "$SCENE" ] || { python scripts/cpu_run.py scripts/make_synthetic_scene.py "$SCENE"; }
rm -rf "$OUT"; mkdir -p "$OUT"
python examples/train_openmvg_lonlat.py cfg/lonlat/synthetic_medium.yaml \
  "$OUT" "$SCENE/sfm_data_train.json" "$SCENE/points.ply" \
  --image-root "$SCENE/images" --iters 1500 --log-every 500 2>&1 | tee "$OUT/train.log"
ply=$(ls -d "$OUT"/*/ply/point_cloud.ply 2>/dev/null | tail -1)
python examples/test_openmvg_lonlat.py cfg/lonlat/synthetic_medium.yaml \
  "$OUT/test" "$SCENE/sfm_data_test.json" "$ply" 2>&1 | tee "$OUT/test.log"
python - "$OUT/test" <<'PY'
import sys, pathlib
vals = [float(l.split()[1]) for l in
        (pathlib.Path(sys.argv[1]) / "psnr_test.txt").read_text().splitlines()]
m = sum(vals) / len(vals)
print(f"[quality_check] held-out PSNR {m:.2f} ({'OK' if m >= 15.0 else 'FAIL'})")
sys.exit(0 if m >= 15.0 else 1)
PY
