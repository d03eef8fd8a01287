"""Pipeline.convert_SHs / compute_cov3D flags: precomputed inputs ≡ in-raster."""

import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.model.gaussians import GaussianModel
from omnigs_tpu.ops.rasterize import RasterConfig
from omnigs_tpu.train.renderer import render_model

import jax

from helpers import random_cloud

CFG = RasterConfig(max_instances=1 << 13, tile_cap=128, chunk=8)


def _model(n=24):
    params = random_cloud(jax.random.PRNGKey(0), n)
    m = GaussianModel.empty(n)
    return m.replace(
        xyz=params["means3d"],
        scaling=jnp.log(params["scales"]),
        rotation=params["quats"],
        opacity=jnp.log(params["opacities"] / (1 - params["opacities"]))[:, None],
        features_dc=params["shs"][:, :1, :],
        features_rest=params["shs"][:, 1:, :],
        active=jnp.ones(n, bool),
    )


def test_precomputed_paths_match():
    camera = Camera(CameraType.LONLAT, 64, 32)
    m = _model()
    args = (m, camera, jnp.eye(4), jnp.zeros(3), jnp.zeros(3), 2, CFG)
    base = render_model(*args)
    sh_pre = render_model(*args, convert_SHs=True)
    cov_pre = render_model(*args, compute_cov3D=True)
    both = render_model(*args, convert_SHs=True, compute_cov3D=True)
    for r in (sh_pre, cov_pre, both):
        np.testing.assert_allclose(r.image, base.image, rtol=1e-5, atol=1e-6)


def test_depth_render_flag():
    camera = Camera(CameraType.LONLAT, 64, 32)
    m = _model()
    res = render_model(
        m, camera, jnp.eye(4), jnp.zeros(3), jnp.zeros(3), 2, CFG,
        render_depth=True,
    )
    # depth channels identical, positive where gaussians hit
    np.testing.assert_allclose(res.image[0], res.image[1])
    assert float(res.image.max()) > 0
