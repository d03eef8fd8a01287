"""High-level render entry point — the `GaussianRenderer` analog.

`/root/reference/src/gaussian_renderer.cpp:29-291` gathers model activations,
builds rasterization settings from a keyframe, and invokes the rasterizer.
Here that is one function over the GaussianModel pytree; camera dispatch is
static and the result carries the visibility filter (radii > 0).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.model.gaussians import GaussianModel
from omnigs_tpu.ops.rasterize import RasterConfig, RenderResult, rasterize


def render_model(
    model: GaussianModel,
    camera: Camera,
    viewmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    bg: jnp.ndarray,
    sh_degree: int,
    config: RasterConfig,
    *,
    full_proj: Optional[jnp.ndarray] = None,
    means2d_ndc: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    render_depth: bool = False,
    convert_SHs: bool = False,
    compute_cov3D: bool = False,
) -> RenderResult:
    """Render the model from a pose. Differentiable w.r.t. model params.

    ``convert_SHs`` / ``compute_cov3D`` mirror the reference's Pipeline.*
    flags (`src/gaussian_renderer.cpp:60-108`): evaluate SH colors /
    covariances outside the rasterizer and feed them precomputed.
    """
    features_override = None
    if render_depth:
        from omnigs_tpu.cameras import world_to_cam

        t = world_to_cam(model.xyz, viewmatrix)
        if camera.camera_type == CameraType.LONLAT:
            depths = jnp.linalg.norm(t, axis=-1)
        else:
            depths = t[..., 2]
        features_override = depths

    colors_precomp = None
    if convert_SHs:
        from omnigs_tpu.ops import sh as sh_ops

        colors_precomp = sh_ops.sh_to_rgb(
            sh_degree, model.get_features(), model.xyz, campos
        )
    cov3d_precomp = None
    if compute_cov3D:
        from omnigs_tpu.ops.covariance import build_cov3d

        cov3d_precomp = build_cov3d(
            model.get_scaling(), model.get_rotation(), scale_modifier
        )

    return rasterize(
        model.xyz,
        model.get_scaling(),
        model.get_rotation(),
        model.get_opacity(),
        model.get_features(),
        camera=camera,
        viewmatrix=viewmatrix,
        campos=campos,
        bg=bg,
        sh_degree=sh_degree,
        config=config,
        scale_modifier=scale_modifier,
        full_proj=full_proj,
        means2d_ndc=means2d_ndc,
        active_mask=model.active,
        features_override=features_override,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
    )
