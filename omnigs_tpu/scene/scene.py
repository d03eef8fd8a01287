"""Scene container: cameras, keyframes, SfM point cloud, spatial extent.

Analog of `GaussianScene` (`/root/reference/src/gaussian_scene.cpp`,
`include/gaussian_scene.h`): holds the camera/keyframe maps and computes the
NeRF++-style normalization radius that parameterizes densification
thresholds (`getNerfppNorm`, `gaussian_scene.cpp:116-155`).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from omnigs_tpu.cameras import Camera
from omnigs_tpu.scene.keyframe import Keyframe


@dataclasses.dataclass
class Scene:
    cameras: Dict[int, Camera] = dataclasses.field(default_factory=dict)
    keyframes: Dict[int, Keyframe] = dataclasses.field(default_factory=dict)
    points: Optional[np.ndarray] = None  # (N, 3)
    colors: Optional[np.ndarray] = None  # (N, 3) in [0, 1]
    # per-camera undistort masks (reference `undistort_mask_[camera_id]`,
    # `gaussian_mapper.cpp:391,786`): rendered images are multiplied by the
    # mask in loss/eval/viewer; None for distortion-free cameras
    undistort_masks: Dict[Camera, np.ndarray] = dataclasses.field(
        default_factory=dict
    )

    def add_keyframe(self, kf: Keyframe):
        self.keyframes[kf.fid] = kf

    def build_undistort_masks(self):
        """Build masks for every distorted camera (idempotent). Call after
        cameras are registered — the loader analog of
        `initUndistortRectifyMapAndMask` (`examples/train_360roam.cpp:186-196`)."""
        from omnigs_tpu.cameras import init_undistort_map_and_mask

        cams = set(self.cameras.values()) | {
            kf.camera for kf in self.keyframes.values()
        }
        for cam in cams:
            if cam.distortion and cam not in self.undistort_masks:
                _, _, mask = init_undistort_map_and_mask(cam)
                if mask is not None:
                    self.undistort_masks[cam] = mask

    def undistort_mask(self, camera: Camera) -> Optional[np.ndarray]:
        """(H, W) float mask for this camera, or None (no distortion)."""
        if camera.distortion and camera not in self.undistort_masks:
            self.build_undistort_masks()
        return self.undistort_masks.get(camera)

    def nerfpp_norm(self) -> Tuple[np.ndarray, float]:
        """(translate, radius): camera-centroid offset and 1.1× the max
        camera distance from it (`gaussian_scene.cpp:116-155`). The radius is
        `cameras_extent_` used by clone/split/prune thresholds."""
        centers = np.stack([kf.campos for kf in self.keyframes.values()])
        avg = centers.mean(axis=0)
        radius = float(np.linalg.norm(centers - avg, axis=-1).max() * 1.1)
        return -avg, radius


class KeyframeSampler:
    """Random keyframe scheduling with times-of-use budgets.

    Mirrors `useOneRandomSlidingWindowKeyframe`
    (`/root/reference/src/gaussian_mapper.cpp:527-577`): each keyframe gets
    `times_of_use` charges when it enters the pool; a random charged
    keyframe is drawn each iteration, and when every budget is exhausted all
    budgets are refilled (epoch boundary).
    """

    def __init__(self, scene: Scene, times_of_use: int = 1, seed: int = 0):
        self.scene = scene
        self.times_of_use = times_of_use
        self.rng = random.Random(seed)
        self.used_times: Dict[int, int] = {fid: 0 for fid in scene.keyframes}
        self._refill()

    def _refill(self):
        for kf in self.scene.keyframes.values():
            kf.remaining_times_of_use = self.times_of_use

    def sample(self) -> Keyframe:
        pool: List[int] = [
            fid
            for fid, kf in self.scene.keyframes.items()
            if kf.remaining_times_of_use > 0
        ]
        if not pool:
            self._refill()
            pool = list(self.scene.keyframes)
        fid = self.rng.choice(pool)
        kf = self.scene.keyframes[fid]
        kf.remaining_times_of_use -= 1
        self.used_times[fid] += 1
        return kf
