#!/usr/bin/env python
"""Scene-sweep benchmark runner — `360roam_run.py` / `egonerf_run.py` analog
(`/root/reference/scripts/360roam_run.py:22-34`): train each scene, then
evaluate the saved checkpoints at the configured test iterations.

Usage:
  python scripts/run_benchmark.py --dataset-dir D --scene-list L --cfg CFG \
      --result-root R [--test-iters 8000 32000]
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--scene-list", required=True)
    ap.add_argument("--cfg", default="/root/reference/cfg/lonlat/360roam_lonlat.yaml")
    ap.add_argument("--result-root", required=True)
    ap.add_argument("--test-iters", type=int, nargs="*", default=[8000, 32000])
    ap.add_argument("--sfm-json", default="openMVG/data_openmvg.json")
    ap.add_argument("--test-json", default="openMVG/data_openmvg_test.json")
    ap.add_argument("--points-ply", default="openMVG/scene.ply")
    args = ap.parse_args()

    with open(args.scene_list) as f:
        scenes = [line.strip() for line in f if line.strip()]

    for scene in scenes:
        scene_root = Path(args.dataset_dir) / scene
        result_dir = Path(args.result_root) / scene
        subprocess.run(
            [
                sys.executable,
                str(REPO / "examples" / "train_openmvg_lonlat.py"),
                args.cfg,
                str(result_dir),
                str(scene_root / args.sfm_json),
                str(scene_root / args.points_ply),
            ],
            check=True,
        )
        for it in args.test_iters:
            subprocess.run(
                [
                    sys.executable,
                    str(REPO / "examples" / "test_openmvg_lonlat.py"),
                    args.cfg,
                    str(result_dir / f"{it}_test"),
                    str(scene_root / args.test_json),
                    str(result_dir / str(it) / "ply" / "point_cloud.ply"),
                ],
                check=True,
            )


if __name__ == "__main__":
    main()
