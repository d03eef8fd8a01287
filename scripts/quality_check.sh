#!/bin/bash
# Quality regression gate: short training on the 512×256 synthetic scene
# must reach the round-1-validated bar (held-out PSNR ≈ 29.4 @1.5k iters;
# fail under 27). Run on chip after kernel/binning changes.
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
print(f"[quality_check] held-out PSNR {m:.2f} ({'OK' if m >= 27.0 else 'FAIL'})")
sys.exit(0 if m >= 27.0 else 1)
PY
