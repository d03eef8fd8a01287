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
    image_filter=None,
) -> Scene:
    """Build a Scene from openMVG json (+ optional sparse cloud PLY).

    ``image_filter(fid) -> bool`` restricts which keyframes load their GT
    image bytes — the host-local data loading hook for multi-host training
    (poses always load; images only for owned data rows).
    """
    sfm_json = Path(sfm_json)
    _undistort_cache = {}
    root = json.loads(sfm_json.read_text())
    scene = Scene()

    for intr in root.get("intrinsics", []):
        cam_id = int(intr["key"])
        name = intr["value"].get("polymorphic_name", "spherical")
        data = intr["value"]["ptr_wrapper"]["data"]
        # spherical intrinsics: {"value0": {"width": W, "height": H}};
        # pinhole variants nest value0.value0 + focal/principal (+ disto)
        v0 = data.get("value0", data)
        if "pinhole" in name:
            vv = v0.get("value0", v0)
            w, h = int(vv["width"]), int(vv["height"])
            f = float(v0.get("focal_length", vv.get("focal_length", 0.0)))
            pp = v0.get("principal_point", [w / 2.0, h / 2.0])
            disto = tuple(
                float(d)
                for d in data.get(
                    "disto_k3", data.get("disto_k1", [])
                )
            )
            # OpenCV order (k1, k2, p1, p2, k3) from openMVG radial k1/k3
            if len(disto) == 1:
                distortion = (disto[0], 0.0, 0.0, 0.0, 0.0)
            elif len(disto) == 3:
                distortion = (disto[0], disto[1], 0.0, 0.0, disto[2])
            else:
                distortion = ()
            if resolution_scale != 1.0:
                w = int(round(w * resolution_scale))
                h = int(round(h * resolution_scale))
                f *= resolution_scale
                pp = [p * resolution_scale for p in pp]
            scene.cameras[cam_id] = Camera(
                CameraType.PINHOLE, w, h,
                fx=f, fy=f, cx=float(pp[0]), cy=float(pp[1]),
                distortion=distortion,
            )
        else:
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
        if load_images and (image_filter is None or image_filter(fid)):
            image = _load_image(img_dir / fname, size=(cam.width, cam.height))
            if cam.distortion:
                # undistort once at load (`examples/train_360roam.cpp:186-196`)
                from omnigs_tpu.cameras import (
                    init_undistort_map_and_mask,
                    undistort_image,
                )

                if cam not in _undistort_cache:
                    _undistort_cache[cam] = init_undistort_map_and_mask(cam)
                m1, m2, _ = _undistort_cache[cam]
                if m1 is not None:
                    image = undistort_image(np.asarray(image), m1, m2)
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
