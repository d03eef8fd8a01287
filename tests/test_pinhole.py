"""Pinhole camera path: projection contract + rasterizer vs oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import Camera, CameraType, focal2fov
from omnigs_tpu.ops.oracle import render_oracle
from omnigs_tpu.ops.preprocess import preprocess
from omnigs_tpu.ops.rasterize import RasterConfig, rasterize
from omnigs_tpu.scene.keyframe import Keyframe

from helpers import random_cloud

CAM = Camera(CameraType.PINHOLE, 64, 48, fx=40.0, fy=40.0, cx=32.0, cy=24.0)


def _front_cloud(n=32, seed=0):
    """Random Gaussians strictly in front of the camera (z in [1, 4])."""
    params = random_cloud(jax.random.PRNGKey(seed), n)
    key = jax.random.PRNGKey(seed + 100)
    xy = jax.random.normal(key, (n, 2)) * 0.8
    z = 1.0 + jax.random.uniform(jax.random.PRNGKey(seed + 200), (n,)) * 3.0
    params["means3d"] = jnp.concatenate([xy * z[:, None] * 0.5, z[:, None]], -1)
    return params


def _full_proj():
    kf = Keyframe(
        0, CAM, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), znear=0.01,
        zfar=100.0,
    )
    return jnp.asarray(kf.full_proj)


def test_pinhole_projection_center():
    """A point on the optical axis lands at the image center."""
    fp = _full_proj()
    prep = preprocess(
        jnp.array([[0.0, 0.0, 2.0]]),
        jnp.full((1, 3), 0.1),
        jnp.array([[1.0, 0, 0, 0]]),
        jnp.array([0.9]),
        jnp.zeros((1, 16, 3)),
        CAM,
        jnp.eye(4),
        jnp.zeros(3),
        sh_degree=0,
        full_proj=fp,
    )
    np.testing.assert_allclose(
        np.asarray(prep.means2d[0]),
        [(CAM.width - 1) / 2, (CAM.height - 1) / 2],
        atol=0.5,
    )
    assert bool(prep.valid[0])
    np.testing.assert_allclose(float(prep.depths[0]), 2.0, rtol=1e-5)


def test_pinhole_near_cull():
    fp = _full_proj()
    prep = preprocess(
        jnp.array([[0.0, 0.0, 0.1], [0.0, 0.0, -2.0]]),
        jnp.full((2, 3), 0.1),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
        jnp.array([0.9, 0.9]),
        jnp.zeros((2, 16, 3)),
        CAM,
        jnp.eye(4),
        jnp.zeros(3),
        sh_degree=0,
        full_proj=fp,
    )
    assert not bool(prep.valid[0])  # z=0.1 ≤ 0.2 near cull
    assert not bool(prep.valid[1])  # behind


def test_pinhole_rasterize_matches_oracle():
    params = _front_cloud()
    fp = _full_proj()
    bg = jnp.array([0.1, 0.2, 0.3])
    prep = preprocess(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        CAM,
        jnp.eye(4),
        jnp.zeros(3),
        sh_degree=2,
        full_proj=fp,
    )
    img_o, T_o, n_o = render_oracle(prep, CAM, bg)
    res = rasterize(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        camera=CAM,
        viewmatrix=jnp.eye(4),
        campos=jnp.zeros(3),
        bg=bg,
        sh_degree=2,
        config=RasterConfig(max_instances=1 << 13, tile_cap=128, chunk=8),
        full_proj=fp,
    )
    np.testing.assert_allclose(res.image, img_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res.final_T, T_o, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(res.n_contrib, n_o)


def test_pinhole_gradients_finite():
    params = _front_cloud(16, seed=1)
    fp = _full_proj()

    def loss(means):
        res = rasterize(
            means,
            params["scales"],
            params["quats"],
            params["opacities"],
            params["shs"],
            camera=CAM,
            viewmatrix=jnp.eye(4),
            campos=jnp.zeros(3),
            bg=jnp.zeros(3),
            sh_degree=1,
            config=RasterConfig(max_instances=1 << 12, tile_cap=64, chunk=8),
            full_proj=fp,
        )
        return jnp.sum(res.image**2)

    g = jax.grad(loss)(params["means3d"])
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0
