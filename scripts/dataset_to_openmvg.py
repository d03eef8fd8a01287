#!/usr/bin/env python
"""Dataset → openMVG sfm_data converter (360Roam / EgoNeRF pose_c2w.json).

Port of `/root/reference/scripts/360roam_to_openmvg_train.py` and the
`egonerf_to_openmvg_*.py` variants: reads per-scene `pose_c2w.json` splits
and emits the spherical-intrinsics openMVG JSON the training entry points
consume. The reference then invokes openMVG binaries to triangulate a sparse
cloud from the known poses; openMVG is not available here, so `--make-points`
synthesizes an initial cloud instead (uniform in a camera-bounding sphere —
densification recovers structure; pass an externally triangulated PLY for
full parity).

Usage:
  python scripts/dataset_to_openmvg.py --dataset-dir D --scene-list L \
      --img-width W --img-height H [--split train|test] [--make-points N]
"""

import argparse
import json
import os
from pathlib import Path

import numpy as np

PTR_WRAPPER_ID = 2147483649
POLYMORPHIC_ID = 1073741824


def convert_scene(
    scene_dir: Path,
    img_width: int,
    img_height: int,
    split: str = "train",
    make_points: int = 0,
):
    with open(scene_dir / "pose_c2w.json") as f:
        frames_file = json.load(f)
    frames = frames_file[split]
    img_dir = str(scene_dir / "images")

    json_views, json_extrs = [], []
    centers = []
    for frame_idx, frame in enumerate(frames):
        json_views.append(
            {
                "key": frame_idx,
                "value": {
                    "polymorphic_id": POLYMORPHIC_ID,
                    "ptr_wrapper": {
                        "id": PTR_WRAPPER_ID + frame_idx,
                        "data": {
                            "local_path": "",
                            "filename": frame["rgb_file"],
                            "width": img_width,
                            "height": img_height,
                            "id_view": frame_idx,
                            "id_intrinsic": 0,
                            "id_pose": frame_idx,
                        },
                    },
                },
            }
        )
        Twc = np.array(frame["transform_matrix"])
        Rwc, twc = Twc[:3, :3], Twc[:3, 3]
        Rcw = np.linalg.inv(Rwc)
        centers.append(twc)
        json_extrs.append(
            {
                "key": frame_idx,
                "value": {
                    "rotation": Rcw.tolist(),
                    "center": twc.tolist(),
                },
            }
        )

    json_intrs = [
        {
            "key": 0,
            "value": {
                "polymorphic_id": PTR_WRAPPER_ID,
                "polymorphic_name": "spherical",
                "ptr_wrapper": {
                    "id": PTR_WRAPPER_ID + len(frames),
                    "data": {
                        "value0": {"width": img_width, "height": img_height}
                    },
                },
            },
        }
    ]

    out_dir = scene_dir / "openMVG"
    out_dir.mkdir(exist_ok=True)
    name = "data_openmvg.json" if split == "train" else f"data_openmvg_{split}.json"
    with open(out_dir / name, "w") as f:
        json.dump(
            {
                "sfm_data_version": "0.3",
                "root_path": img_dir,
                "views": json_views,
                "intrinsics": json_intrs,
                "extrinsics": json_extrs,
                "structure": [],
                "control_points": [],
            },
            f,
        )

    if make_points and split == "train":
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from omnigs_tpu.io.ply import save_points_ply

        centers = np.stack(centers)
        avg = centers.mean(0)
        radius = float(np.linalg.norm(centers - avg, axis=-1).max()) * 3.0 + 1.0
        rng = np.random.default_rng(0)
        d = rng.normal(size=(make_points, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        r = radius * np.cbrt(rng.random((make_points, 1)))
        pts = (avg + d * r).astype(np.float32)
        cols = np.full((make_points, 3), 0.5, np.float32)
        save_points_ply(out_dir / "scene_init.ply", pts, cols)
    return out_dir / name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--scene-list", required=True)
    ap.add_argument("--img-width", type=int, required=True)
    ap.add_argument("--img-height", type=int, required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--make-points", type=int, default=0)
    args = ap.parse_args()

    with open(args.scene_list) as f:
        scenes = [line.strip() for line in f if line.strip()]
    for scene in scenes:
        out = convert_scene(
            Path(args.dataset_dir) / scene,
            args.img_width,
            args.img_height,
            args.split,
            args.make_points,
        )
        print(f"{scene}: {out}")


if __name__ == "__main__":
    main()
