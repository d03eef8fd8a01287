"""Camera models as pure functions (project, jacobian) + a small container.

The reference forks an entire rasterizer class per camera model
(`/root/reference/src/rasterize_points.cu:105-161`); here a camera is a value
and the projection/Jacobian are pure functions selected *statically* at trace
time, so XLA compiles exactly one specialized rasterizer per camera type.

Conventions
-----------
* ``viewmatrix`` is the world→camera rigid transform ``T_cw`` as a (4, 4)
  row-major matrix: ``t_cam = viewmatrix[:3, :3] @ p_world + viewmatrix[:3, 3]``.
  (The reference stores the transpose and indexes it column-major —
  `/root/reference/cuda_rasterizer/auxiliary.h:85-93` — which is the same map.)
* Pixel coordinates: x right (width), y down (height). Screen ("NDC")
  coordinates live in [-1, 1]; ``ndc2pix(v, S) = ((v + 1) * S - 1) / 2``
  (`auxiliary.h:51-54`).
* Lonlat projection (`auxiliary.h:236-248`): ``lon = atan2(x, z)``,
  ``lat = asin(y / r)``, screen = ``(lon / pi, 2 * lat / pi)``. Depth is the
  radial distance r (`forward.cu:697`), versus camera z for pinhole
  (`forward.cu:334`).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

import jax.numpy as jnp


class CameraType(enum.IntEnum):
    """Matches the reference enum (`/root/reference/include/camera.h:54-58`)."""

    INVALID = 0
    PINHOLE = 1
    FISHEYE = 2
    LONLAT = 3


@dataclasses.dataclass(frozen=True)
class Camera:
    """Static camera description. Hashable → usable as a jit static arg."""

    camera_type: CameraType
    width: int
    height: int
    # Pinhole intrinsics (ignored for LONLAT).
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    # Lens distortion coefficients in OpenCV order (k1, k2, p1, p2[, k3]).
    # Images are undistorted at load time (`undistort_image`); rendering
    # always works in the rectified model. Nonempty ⇒ an undistort mask is
    # built and multiplied onto rendered images in loss/eval/viewer
    # (reference `include/camera.h:86-125`, `gaussian_mapper.cpp:391`).
    distortion: Tuple[float, ...] = ()

    @property
    def tan_fovx(self) -> float:
        return self.width / (2.0 * self.fx) if self.fx else 0.0

    @property
    def tan_fovy(self) -> float:
        return self.height / (2.0 * self.fy) if self.fy else 0.0

    @property
    def num_pixels(self) -> int:
        return self.width * self.height


def init_undistort_map_and_mask(camera: "Camera"):
    """Host-side undistort rectify maps + valid-pixel mask.

    `Camera::initUndistortRectifyMapAndMask` analog
    (`/root/reference/include/camera.h:71-111`): builds the cv2 remap tables
    for the camera's distortion and derives the mask by remapping a white
    image — fractional values at the warped border, exactly like the
    reference. Returns (map1, map2, mask (H, W) float32) or (None, None,
    None) when the camera has no distortion.
    """
    import cv2
    import numpy as np

    if not camera.distortion or not any(camera.distortion):
        return None, None, None
    K = np.array(
        [
            [camera.fx, 0.0, camera.cx],
            [0.0, camera.fy, camera.cy],
            [0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    dist = np.asarray(camera.distortion, np.float32)
    map1, map2 = cv2.initUndistortRectifyMap(
        K, dist, np.eye(3, dtype=np.float32), K,
        (camera.width, camera.height), cv2.CV_32FC1,
    )
    white = np.ones((camera.height, camera.width), np.float32)
    mask = cv2.remap(white, map1, map2, cv2.INTER_LINEAR)
    return map1, map2, mask


def undistort_image(img, map1, map2):
    """`Camera::undistortImage` analog (`include/camera.h:113-122`)."""
    import cv2

    return cv2.remap(img, map1, map2, cv2.INTER_LINEAR)


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """Screen [-1, 1] → pixel coordinate (`auxiliary.h:51-54`)."""
    return ((v + 1.0) * size - 1.0) * 0.5


_EPS = 1.0e-7  # the reference's +1e-7 pole/seam guards (`forward.cu:148-152`)


def world_to_cam(means: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world points → camera frame under T_cw."""
    return means @ viewmatrix[:3, :3].T + viewmatrix[:3, 3]


def lonlat_project(t: jnp.ndarray, width: int, height: int):
    """Equirectangular projection of camera-space points.

    Args:
      t: (..., 3) camera-space points.

    Returns:
      (pix, depth, valid): pixel coords (..., 2), radial depth (...,), and the
      validity mask (r² > 0.04 near-sphere cull, `auxiliary.h:198-220`).
    """
    rr = jnp.sum(t * t, axis=-1)
    r = jnp.sqrt(rr)
    inv_r = 1.0 / (r + _EPS)
    lon = jnp.arctan2(t[..., 0], t[..., 2])
    lat = jnp.arcsin(jnp.clip(t[..., 1] * inv_r, -1.0, 1.0))
    sx = lon * (1.0 / jnp.pi)
    sy = lat * (2.0 / jnp.pi)
    pix = jnp.stack([ndc2pix(sx, width), ndc2pix(sy, height)], axis=-1)
    valid = rr > 0.04
    return pix, r, valid


def lonlat_jacobian_rows(t: jnp.ndarray, width: int, height: int):
    """∂pixel/∂t for the equirect map (`forward.cu:146-167`) as component
    columns ((Jx0, Jx1, Jx2), (Jy0, Jy1, Jy2)) — the layout-friendly form
    (stacking into (..., 2, 3) forces tiny-tile TPU layouts downstream).

    dpx/dt = (W/2π)·[z, 0, -x] / (x²+z²)
    dpy/dt = (H/π)·[-xy, r_xz², -zy] / (r_xz · r²)
    with the reference's +1e-7 guards at the poles/origin.
    """
    x, y, z = t[..., 0], t[..., 1], t[..., 2]
    rxz2 = x * x + z * z
    rxz2_inv = 1.0 / (rxz2 + _EPS)
    rxz = jnp.sqrt(rxz2)
    rxz_inv = 1.0 / (rxz + _EPS)
    rr = rxz2 + y * y
    rr_inv = 1.0 / (rr + _EPS)

    w_2pi = width * 0.5 / jnp.pi
    h_pi = height / jnp.pi

    zeros = jnp.zeros_like(x)
    row_x = (w_2pi * z * rxz2_inv, zeros, -w_2pi * x * rxz2_inv)
    row_y = (
        -h_pi * x * y * rxz_inv * rr_inv,
        h_pi * rxz * rr_inv,
        -h_pi * z * y * rxz_inv * rr_inv,
    )
    return row_x, row_y


def lonlat_jacobian(t: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Stacked (..., 2, 3) form of `lonlat_jacobian_rows`."""
    row_x, row_y = lonlat_jacobian_rows(t, width, height)
    return jnp.stack(
        [jnp.stack(row_x, axis=-1), jnp.stack(row_y, axis=-1)], axis=-2
    )


def pinhole_project(
    t: jnp.ndarray,
    width: int,
    height: int,
    full_proj: jnp.ndarray,
    means_world: jnp.ndarray,
):
    """Pinhole projection through the full (view·proj) matrix.

    Mirrors `forward.cu:275-279` + `auxiliary.h:166-196`: homogeneous
    transform of the *world* point by ``full_proj`` (4, 4, row-major, i.e.
    ``hom = full_proj @ [p, 1]``), perspective divide with +1e-7 guard, near
    cull at camera z ≤ 0.2.

    Returns (pix, depth, valid) with depth = camera-space z.
    """
    ones = jnp.ones_like(means_world[..., :1])
    hom = jnp.concatenate([means_world, ones], axis=-1) @ full_proj.T
    p_w = 1.0 / (hom[..., 3] + _EPS)
    sx = hom[..., 0] * p_w
    sy = hom[..., 1] * p_w
    pix = jnp.stack([ndc2pix(sx, width), ndc2pix(sy, height)], axis=-1)
    depth = t[..., 2]
    valid = depth > 0.2
    return pix, depth, valid


def pinhole_jacobian_rows(
    t: jnp.ndarray, fx: float, fy: float, tan_fovx: float, tan_fovy: float
):
    """Perspective EWA Jacobian with the 1.3·tan(fov) clamp
    (`forward.cu:94-106`), as component columns (see
    `lonlat_jacobian_rows`)."""
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    z = t[..., 2]
    tx = jnp.clip(t[..., 0] / z, -limx, limx) * z
    ty = jnp.clip(t[..., 1] / z, -limy, limy) * z
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(z)
    row_x = (fx * inv_z, zeros, -fx * tx * inv_z2)
    row_y = (zeros, fy * inv_z, -fy * ty * inv_z2)
    return row_x, row_y


def pinhole_jacobian(
    t: jnp.ndarray, fx: float, fy: float, tan_fovx: float, tan_fovy: float
) -> jnp.ndarray:
    """Stacked (..., 2, 3) form of `pinhole_jacobian_rows`."""
    row_x, row_y = pinhole_jacobian_rows(t, fx, fy, tan_fovx, tan_fovy)
    return jnp.stack(
        [jnp.stack(row_x, axis=-1), jnp.stack(row_y, axis=-1)], axis=-2
    )


def focal2fov(focal: float, pixels: int) -> float:
    """`/root/reference/include/graphics_utils.h:46-54`."""
    import math

    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: int) -> float:
    import math

    return pixels / (2.0 * math.tan(fov * 0.5))


def getProjectionMatrix(
    znear: float, zfar: float, fovx: float, fovy: float
) -> jnp.ndarray:
    """OpenGL-style projection matrix (`src/gaussian_keyframe.cpp:197-225`)."""
    import math

    tan_half_x = math.tan(fovx / 2.0)
    tan_half_y = math.tan(fovy / 2.0)
    top = tan_half_y * znear
    bottom = -top
    right = tan_half_x * znear
    left = -right
    P = jnp.zeros((4, 4), dtype=jnp.float32)
    z_sign = 1.0
    P = P.at[0, 0].set(2.0 * znear / (right - left))
    P = P.at[1, 1].set(2.0 * znear / (top - bottom))
    P = P.at[0, 2].set((right + left) / (right - left))
    P = P.at[1, 2].set((top + bottom) / (top - bottom))
    P = P.at[3, 2].set(z_sign)
    P = P.at[2, 2].set(z_sign * zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return P
