"""Result recording: cameras.json, cfg_args, keyframe-use stats, PLY saves.

Ports the reference's result-saving surface (`/root/reference/src/
gaussian_mapper.cpp:859-984`): `keyframesToJson` (3DGS-ecosystem
cameras.json), `saveModelParams` (the `cfg_args` Namespace string understood
by 3DGS tooling), `writeKeyframeUsedTimes`, and the iteration-numbered
point_cloud PLY layout.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from omnigs_tpu.cameras import CameraType
from omnigs_tpu.io.ply import save_gaussian_ply
from omnigs_tpu.scene.scene import Scene


def keyframes_to_json(scene: Scene) -> list:
    """`keyframesToJson` (`gaussian_mapper.cpp:874-931`)."""
    out = []
    for idx, fid in enumerate(sorted(scene.keyframes)):
        kf = scene.keyframes[fid]
        W2C = kf.viewmatrix
        C2W = np.linalg.inv(W2C)
        pos = C2W[:3, 3]
        rot = C2W[:3, :3]
        entry = {
            "id": idx,
            "img_name": kf.img_filename or f"{fid:08d}",
            "width": kf.camera.width,
            "height": kf.camera.height,
            "position": [float(x) for x in pos],
            "rotation": [[float(x) for x in row] for row in rot],
        }
        if kf.camera.camera_type == CameraType.PINHOLE:
            entry["fx"] = kf.camera.fx
            entry["fy"] = kf.camera.fy
        else:  # lonlat: the reference exports the 120°/60° viewer fiction
            entry["camera_type"] = int(kf.camera.camera_type)
        out.append(entry)
    return out


def save_cameras_json(scene: Scene, result_dir: Path):
    (Path(result_dir) / "cameras.json").write_text(
        json.dumps(keyframes_to_json(scene))
    )


def save_model_params(result_dir: Path, sh_degree: int, white_background: bool,
                      source_path: str = "", model_path: str = ""):
    """`saveModelParams` → `cfg_args` (`gaussian_mapper.cpp:933-953`)."""
    ns = (
        "Namespace(eval=False, images='images', model_path='{}', "
        "resolution=-1, sh_degree={}, source_path='{}', white_background={})"
    ).format(model_path, sh_degree, source_path, white_background)
    (Path(result_dir) / "cfg_args").write_text(ns)


def write_keyframe_used_times(sampler, result_dir: Path, suffix: str = ""):
    """`writeKeyframeUsedTimes` (`gaussian_mapper.cpp:955-973`)."""
    path = Path(result_dir)
    path.mkdir(parents=True, exist_ok=True)
    lines = [
        f"{fid} {count}" for fid, count in sorted(sampler.used_times.items())
    ]
    (path / f"keyframe_used_times{suffix}.txt").write_text(
        "\n".join(lines) + "\n"
    )


def save_ply_checkpoint(model, result_dir: Path, iteration: int):
    """Iteration-numbered checkpoint layout
    (`gaussian_mapper.cpp:859-872`: `<result>/<iter>/ply/point_cloud.ply`)."""
    d = Path(result_dir) / str(iteration) / "ply"
    d.mkdir(parents=True, exist_ok=True)
    save_gaussian_ply(d / "point_cloud.ply", model)
    return d / "point_cloud.ply"
