"""Per-Gaussian preprocessing: cull, project, EWA cov2D, SH→RGB, tile rects.

The JAX analog of `preprocessCUDA` / `preprocessLonlatCUDA`
(`/root/reference/cuda_rasterizer/forward.cu:231-340,593-703`), shared by the
brute-force oracle, the XLA tile rasterizer, and (as reference semantics) the
Pallas kernels. Everything is vectorized over the Gaussian axis and fully
differentiable; culling is expressed as masks, never as dynamic shapes.

Camera dispatch is *static*: the `Camera.camera_type` is Python-level, so jit
compiles one specialization per camera model (the reference instead forks two
rasterizer classes, `src/rasterize_points.cu:105-161`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from omnigs_tpu.cameras import (
    Camera,
    CameraType,
    lonlat_jacobian_rows,
    lonlat_project,
    pinhole_jacobian_rows,
    pinhole_project,
    world_to_cam,
)
from omnigs_tpu.ops import covariance as cov_ops
from omnigs_tpu.ops import sh as sh_ops

# BLOCK_X = BLOCK_Y (`cuda_rasterizer/config.h:25-27`). Env-overridable for
# tile-size A/B sweeps on chip (scripts/kernel_bench.py — smaller tiles cut
# pixel-instance pairs via finer rect/ellipse culling but multiply per-tile
# chunk-padding and DMA overheads); production default 16.
import os as _os

TILE = int(_os.environ.get("OMNIGS_TILE", "16"))
# A stray env var silently changes rasterizer geometry for EVERY consumer
# (training, eval, checkpoints), so validate hard and warn loudly.
# TILE ≥ 12 is a Mosaic layout constraint (3·TILE·TILE output reshape needs
# 3·PX lane-aligned; BENCH.md tile-size analysis), and only {8, 16, 32}
# have been vetted at all (8/32 measured dead, kept for sweeps).
if TILE not in (8, 16, 32):
    raise ValueError(
        f"OMNIGS_TILE={TILE} unsupported: must be one of 8, 16, 32"
    )
if TILE != 16:
    import sys as _sys

    print(
        f"[omnigs_tpu] WARNING: OMNIGS_TILE={TILE} overrides the production "
        "tile size (16); this changes rasterizer geometry for every "
        "consumer and is only vetted for benchmark sweeps",
        file=_sys.stderr,
    )


class Preprocessed(NamedTuple):
    """Per-Gaussian rasterization state (all arrays length P on axis 0)."""

    means2d: jnp.ndarray  # (P, 2) pixel coordinates
    depths: jnp.ndarray  # (P,) camera z (pinhole) / radial distance (lonlat)
    conic: jnp.ndarray  # (P, 3) inverse 2D covariance [A, B, C]
    radii: jnp.ndarray  # (P,) float screen radius; 0 ⇒ culled
    rgb: jnp.ndarray  # (P, 3) clamped colors
    opacity: jnp.ndarray  # (P,) activated opacities
    rect: jnp.ndarray  # (P, 4) int32 tile rect [x0, y0, x1, y1), clipped
    tiles_touched: jnp.ndarray  # (P,) int32 number of covered tiles
    valid: jnp.ndarray  # (P,) bool — survives all culls


def tile_grid(camera: Camera):
    return (
        (camera.width + TILE - 1) // TILE,
        (camera.height + TILE - 1) // TILE,
    )


def compute_rect(means2d: jnp.ndarray, radii: jnp.ndarray, grid_x: int, grid_y: int):
    """Bounding tile rectangle, non-cyclic like the reference's `getRect`
    (`auxiliary.h:56-66`; the ±180° seam is clipped, not wrapped — the cyclic
    variant is dead code, `auxiliary.h:68-83`)."""
    x0 = jnp.clip(
        jnp.floor((means2d[..., 0] - radii) / TILE).astype(jnp.int32), 0, grid_x
    )
    y0 = jnp.clip(
        jnp.floor((means2d[..., 1] - radii) / TILE).astype(jnp.int32), 0, grid_y
    )
    x1 = jnp.clip(
        jnp.floor((means2d[..., 0] + radii + TILE - 1) / TILE).astype(jnp.int32),
        0,
        grid_x,
    )
    y1 = jnp.clip(
        jnp.floor((means2d[..., 1] + radii + TILE - 1) / TILE).astype(jnp.int32),
        0,
        grid_y,
    )
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    camera: Camera,
    viewmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    sh_degree: int,
    scale_modifier: float = 1.0,
    full_proj: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
    tight_culling: bool = False,
) -> Preprocessed:
    """Vectorized per-Gaussian preprocess.

    Args:
      means3d: (P, 3) world positions.
      scales: (P, 3) *activated* scales (exp already applied).
      quats: (P, 4) *activated* (normalized) quaternions, (w, x, y, z).
      opacities: (P,) activated opacities in (0, 1).
      shs: (P, M, 3) SH coefficients.
      camera: static camera description.
      viewmatrix: (4, 4) T_cw.
      campos: (3,) camera center in world frame.
      sh_degree: static active SH degree.
      active_mask: optional (P,) bool of live capacity slots.
    """
    W, H = camera.width, camera.height
    gx, gy = tile_grid(camera)
    t = world_to_cam(means3d, viewmatrix)

    # NaN hygiene: culled points (e.g. inactive capacity slots sitting at the
    # camera origin) would produce NaN *gradients* through the projection
    # even though their outputs are masked — jnp.where does not block
    # backward NaNs. Substitute a safe point for culled rows before any
    # singular math; `in_front` is computed from the true t.
    safe_point = jnp.array([0.0, 0.0, 1.0], dtype=t.dtype)
    if camera.camera_type == CameraType.LONLAT:
        in_front = jnp.sum(t * t, axis=-1) > 0.04  # `too_close` cull
        t_safe = jnp.where(in_front[..., None], t, safe_point)
        means2d, depths, _ = lonlat_project(t_safe, W, H)
        j_rows = lonlat_jacobian_rows(t_safe, W, H)
    elif camera.camera_type == CameraType.PINHOLE:
        if full_proj is None:
            raise ValueError("pinhole camera requires full_proj")
        in_front = t[..., 2] > 0.2  # `in_frustum` near cull
        t_safe = jnp.where(in_front[..., None], t, safe_point)
        means3d_safe = jnp.where(
            in_front[..., None],
            means3d,
            campos + viewmatrix[:3, :3].T @ safe_point,
        )
        means2d, depths, _ = pinhole_project(
            t_safe, W, H, full_proj, means3d_safe
        )
        j_rows = pinhole_jacobian_rows(
            t_safe, camera.fx, camera.fy, camera.tan_fovx, camera.tan_fovy
        )
    else:
        raise NotImplementedError(f"camera_type {camera.camera_type}")

    # Covariance chain in component (column) form: the batched
    # (P, 2, 3)/(P, 3, 3) matmul form lowers to bf16 convolutions with
    # tiny-tile layouts on TPU — ~20 ms of pure layout shuffling at P=131k.
    if cov3d_precomp is None:
        cov6 = cov_ops.build_cov3d_components(scales, quats, scale_modifier)
    else:
        cov6 = tuple(cov3d_precomp[..., i] for i in range(6))
    c2a, c2b, c2c = cov_ops.project_cov3d_components(
        cov6, j_rows, viewmatrix[:3, :3]
    )
    (cA, cB, cC), det = cov_ops.invert_cov2d_components(c2a, c2b, c2c)
    conic = jnp.stack([cA, cB, cC], axis=-1)
    radii = cov_ops.cov2d_extent_components(
        c2a, c2c, det, opacity=opacities if tight_culling else None
    )

    rect = compute_rect(means2d, radii, gx, gy)
    # The binning layout invariant (per-tile rect-cover counts == emitted
    # instances per tile) requires every consumer to read the SAME rect.
    # Under jit, XLA duplicates the cheap float chain ending in this
    # floor→int into multiple consumer fusions, and the clones can round
    # differently — silently corrupting whole tile slabs (measured 0.78
    # image error at 131k Gaussians / 1920×960). Materializing rect once
    # makes all downstream layout math exact int ops on one tensor; the
    # barrier costs one (P,4) int32 materialization, nothing else.
    rect = jax.lax.optimization_barrier(rect)
    area = (rect[..., 2] - rect[..., 0]) * (rect[..., 3] - rect[..., 1])

    valid = in_front & (det != 0.0) & (area > 0)
    if active_mask is not None:
        valid = valid & active_mask

    if colors_precomp is None:
        # same NaN hygiene: the view-direction normalization is singular at
        # mean == campos (inactive slots)
        means3d_sh = jnp.where(
            in_front[..., None], means3d, campos + safe_point
        )
        rgb = sh_ops.sh_to_rgb(sh_degree, shs, means3d_sh, campos)
    else:
        rgb = colors_precomp

    radii = jnp.where(valid, radii, 0.0)
    tiles = jnp.where(valid, area, 0).astype(jnp.int32)
    return Preprocessed(
        means2d=means2d,
        depths=depths,
        conic=conic,
        radii=radii,
        rgb=rgb,
        opacity=opacities,
        rect=rect,
        tiles_touched=tiles,
        valid=valid,
    )
