"""openMVG sfm_data loaders for 360Roam / EgoNeRF datasets.

Port of the dataset entry points (`/root/reference/examples/
train_360roam.cpp:53-257`, `train_egonerf_omniblender.cpp:264-268`): an
openMVG `sfm_data.json` holds spherical ("lonlat") intrinsics, views
(filename + pose/intrinsic ids), and extrinsics (R_cw + camera center);
the sparse cloud is a PLY with float (360Roam) or double (EgoNeRF) xyz.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Union

import numpy as np

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.io.ply import load_points_ply
from omnigs_tpu.scene.keyframe import Keyframe, pose_from_center
from omnigs_tpu.scene.scene import Scene


def _load_image(path: Path, size=None) -> np.ndarray:
    if size is not None:
        from omnigs_tpu.io.native_loader import load_image

        return load_image(path, size[0], size[1])
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def load_openmvg_scene(
    sfm_json: Union[str, Path],
    points_ply: Optional[Union[str, Path]] = None,
    image_root: Optional[Union[str, Path]] = None,
    load_images: bool = True,
    znear: float = 0.01,
    zfar: float = 100.0,
    resolution_scale: float = 1.0,
) -> Scene:
    """Build a Scene from openMVG json (+ optional sparse cloud PLY)."""
    sfm_json = Path(sfm_json)
    root = json.loads(sfm_json.read_text())
    scene = Scene()

    for intr in root.get("intrinsics", []):
        cam_id = int(intr["key"])
        data = intr["value"]["ptr_wrapper"]["data"]
        # spherical intrinsics: {"value0": {"width": W, "height": H}}
        v0 = data.get("value0", data)
        w, h = int(v0["width"]), int(v0["height"])
        if resolution_scale != 1.0:
            w = int(round(w * resolution_scale))
            h = int(round(h * resolution_scale))
        scene.cameras[cam_id] = Camera(CameraType.LONLAT, w, h)

    extr = {
        int(e["key"]): e["value"] for e in root.get("extrinsics", [])
    }
    img_dir = Path(image_root) if image_root else Path(root.get("root_path", "."))

    for view in root.get("views", []):
        fid = int(view["key"])
        data = view["value"]["ptr_wrapper"]["data"]
        pose_id = int(data["id_pose"])
        cam_id = int(data["id_intrinsic"])
        if pose_id not in extr:
            continue
        e = extr[pose_id]
        R_cw = np.asarray(e["rotation"], dtype=np.float32)
        center = np.asarray(e["center"], dtype=np.float32)
        R_cw, t_cw = pose_from_center(R_cw, center)
        cam = scene.cameras[cam_id]
        image = None
        fname = data["filename"]
        if load_images:
            image = _load_image(img_dir / fname, size=(cam.width, cam.height))
        scene.add_keyframe(
            Keyframe(
                fid=fid,
                camera=cam,
                R_cw=R_cw,
                t_cw=t_cw,
                image=image,
                img_filename=fname,
                znear=znear,
                zfar=zfar,
            )
        )

    if points_ply is not None:
        pts, cols = load_points_ply(points_ply)
        scene.points, scene.colors = pts, cols
    return scene
