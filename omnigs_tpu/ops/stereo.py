"""Stereo / monocular geometry ops (SLAM-heritage point seeding).

TPU-native equivalents of the reference's point-ops CUDA kernels
(`/root/reference/src/stereo_vision.cu:42-139`, helper math
`/root/reference/cuda_rasterizer/stereo_vision.h:41-56`): depth-map
back-projection and the "inactive geometry densify" keypoint seeding used by
the Photo-SLAM lineage (`GaussianMapper::isdoingInactiveGeoDensify`,
`/root/reference/src/gaussian_mapper.cpp:1056`). The reference launches one
CUDA thread per point with an O(N) inner scan per keypoint; here both ops are
single fused XLA programs — the neighbor search becomes one (N, N) distance
matrix, which XLA tiles onto the MXU/VPU, and the dynamic boolean compaction
the reference does host-side (`stereo_vision.cu:213-215`) becomes a static
validity mask so the op stays jit-able.

Behavioral quirks preserved on purpose (documented, reference-cited):

* ``max_pixel_dist`` is compared against the **squared** pixel distance
  (`stereo_vision.cu:117` — the threshold is never squared), exclusive on >.
* Ties in the neighbor search resolve to the lowest keypoint index
  (`stereo_vision.cu:117` skips `dist >= min_dist`).
* A keypoint with no positive-depth neighbor gets z = -1 and is masked out;
  pass-through keypoints (has3D) with non-positive original z are masked out
  by the same z > 0 filter (`stereo_vision.cu:213`).

One conscious deviation: the reference samples neighbor colors at the flat
*pixel* index into an interleaved RGB buffer (`stereo_vision.cu:96-98` reads
``colors[v*width+u + {0,1,2}]``, which for an (H, W, 3) buffer straddles
pixels). Here ``colors`` is an explicit (num_pixels, 3) array indexed by
pixel — the sane semantics the reference code intends.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def reproject_depth_pinhole(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    intr: Tuple[float, float, float, float],
    width: int,
) -> jnp.ndarray:
    """Back-project a flat depth map to camera-space points.

    Args:
      depth: (P,) per-pixel depth, row-major flat image.
      mask: (P,) bool; masked-out pixels yield (0, 0, 0) — the reference
        leaves its zero-initialized output untouched for them
        (`stereo_vision.cu:54-55,155`).
      intr: (fx, fy, cx, cy).
      width: image width in pixels.

    Returns:
      (P, 3) camera-space points: ((u-cx)·d/fx, (v-cy)·d/fy, d)
      (`cuda_rasterizer/stereo_vision.h:41-56`).
    """
    fx, fy, cx, cy = intr
    p = depth.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    v = (idx // width).astype(depth.dtype)
    u = (idx % width).astype(depth.dtype)
    pts = jnp.stack(
        [(u - cx) * depth / fx, (v - cy) * depth / fy, depth], axis=-1
    )
    return jnp.where(mask[:, None], pts, 0.0)


def inactive_geo_densify(
    kps_pixel: jnp.ndarray,
    kps_has3d: jnp.ndarray,
    kps_point_local: jnp.ndarray,
    colors: jnp.ndarray,
    max_pixel_dist: float,
    intr: Tuple[float, float, float, float],
    width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Seed 3D points for keypoints lacking geometry from their nearest
    triangulated neighbor's depth.

    The reference's
    ``monocularPinholeInactiveGeoDensifyBySearchingNeighborhoodKeypoints``
    (`stereo_vision.cu:66-139,175-218`): keypoints that already have a local
    3D point pass through; the rest take the depth (z) of the nearest has3D
    keypoint within ``max_pixel_dist`` (squared-distance compare, reference
    quirk) and back-project it through the pinhole intrinsics. Colors are
    sampled at each keypoint's pixel.

    Args:
      kps_pixel: (N, 2) keypoint pixel coords (u, v).
      kps_has3d: (N,) bool — keypoint already has a triangulated point.
      kps_point_local: (N, 3) camera-space points (valid where has3D).
      colors: (num_pixels, 3) flat row-major image.
      max_pixel_dist: neighbor threshold, compared to squared pixel distance.
      intr: (fx, fy, cx, cy).
      width: image width.

    Returns:
      (points (N, 3), colors (N, 3), valid (N,) bool). Static shapes: the
      reference's host-side ``result_pt[z > 0]`` compaction
      (`stereo_vision.cu:213-215`) is the ``valid`` mask here; callers pipe
      it into the model's free-slot allocator (`model/transform.py`
      ``increase_pcd``), which consumes masks natively.
    """
    fx, fy, cx, cy = intr
    n = kps_pixel.shape[0]
    u = kps_pixel[:, 0]
    v = kps_pixel[:, 1]

    # (N, N) squared pixel distances — one MXU-friendly dense pass replaces
    # the reference's per-thread O(N) scan (`stereo_vision.cu:105-122`).
    du = u[:, None] - u[None, :]
    dv = v[:, None] - v[None, :]
    dist2 = du * du + dv * dv
    eligible = kps_has3d[None, :] & ~jnp.eye(n, dtype=bool)
    dist2 = jnp.where(
        eligible & (dist2 <= max_pixel_dist), dist2, jnp.inf
    )
    nearest = jnp.argmin(dist2, axis=1)  # ties → lowest index, ≡ reference
    found = jnp.isfinite(jnp.take_along_axis(dist2, nearest[:, None], 1))[:, 0]
    depth = jnp.where(found, kps_point_local[nearest, 2], -1.0)

    reproj = jnp.stack(
        [(u - cx) * depth / fx, (v - cy) * depth / fy, depth], axis=-1
    )
    points = jnp.where(kps_has3d[:, None], kps_point_local, reproj)

    pix = (v.astype(jnp.int32) * width + u.astype(jnp.int32)).clip(
        0, colors.shape[0] - 1
    )
    out_colors = colors[pix]

    valid = points[:, 2] > 0.0
    # reference zeroes color output for not-found keypoints (only z is set)
    out_colors = jnp.where(valid[:, None], out_colors, 0.0)
    return points, out_colors, valid
