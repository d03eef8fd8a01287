"""M1 tile-binned rasterizer vs the M0 oracle: forward + backward allclose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.ops.oracle import render_oracle
from omnigs_tpu.ops.preprocess import preprocess
from omnigs_tpu.ops.rasterize import RasterConfig, rasterize

from helpers import random_cloud, simple_cloud

CFG = RasterConfig(max_instances=1 << 14, tile_cap=128, chunk=8)


def _oracle(params, camera, vm, campos, bg, deg):
    prep = preprocess(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        camera,
        vm,
        campos,
        sh_degree=deg,
    )
    return render_oracle(prep, camera, bg)


def _tiled(params, camera, vm, campos, bg, deg, cfg=CFG):
    return rasterize(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        camera=camera,
        viewmatrix=vm,
        campos=campos,
        bg=bg,
        sh_degree=deg,
        config=cfg,
    )


def test_simple_cloud_matches_oracle():
    params, camera, vm, campos = simple_cloud(width=128, height=64)
    bg = jnp.array([0.1, 0.2, 0.3])
    img_o, T_o, n_o = _oracle(params, camera, vm, campos, bg, 0)
    res = _tiled(params, camera, vm, campos, bg, 0)
    np.testing.assert_allclose(res.image, img_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(res.final_T, T_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(res.n_contrib, n_o)
    assert int(res.overflow) == 0
    assert int(res.truncated) == 0


@pytest.mark.parametrize("seed,deg", [(0, 0), (1, 2), (2, 3)])
def test_random_cloud_matches_oracle(seed, deg):
    camera = Camera(CameraType.LONLAT, 64, 32)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    params = random_cloud(jax.random.PRNGKey(seed), 32)
    bg = jnp.zeros(3)
    img_o, T_o, n_o = _oracle(params, camera, vm, campos, bg, deg)
    res = _tiled(params, camera, vm, campos, bg, deg)
    np.testing.assert_allclose(res.image, img_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res.final_T, T_o, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(res.n_contrib, n_o)


def test_gradients_match_oracle():
    camera = Camera(CameraType.LONLAT, 64, 32)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    params = random_cloud(jax.random.PRNGKey(3), 24)
    bg = jnp.array([0.3, 0.3, 0.3])
    target = jnp.linspace(0, 1, 64 * 32 * 3).reshape(3, 32, 64)

    def loss_oracle(means, scales, quats, opac, shs):
        p = dict(means3d=means, scales=scales, quats=quats, opacities=opac, shs=shs)
        img, _, _ = _oracle(p, camera, vm, campos, bg, 2)
        return jnp.mean((img - target) ** 2)

    def loss_tiled(means, scales, quats, opac, shs):
        p = dict(means3d=means, scales=scales, quats=quats, opacities=opac, shs=shs)
        res = _tiled(p, camera, vm, campos, bg, 2)
        return jnp.mean((res.image - target) ** 2)

    args = (
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
    )
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    g_t = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "quats", "opacity", "sh"]
    for go, gt, name in zip(g_o, g_t, names):
        scale = float(jnp.abs(go).max()) + 1e-12
        np.testing.assert_allclose(
            gt, go, rtol=5e-4, atol=5e-5 * scale, err_msg=name
        )


def test_means2d_ndc_gradient_channel():
    """The zero NDC offset receives screen-space grads (densify stats)."""
    camera = Camera(CameraType.LONLAT, 64, 32)
    params = random_cloud(jax.random.PRNGKey(4), 16)
    zeros = jnp.zeros((16, 2))

    def loss(ndc):
        res = rasterize(
            params["means3d"],
            params["scales"],
            params["quats"],
            params["opacities"],
            params["shs"],
            camera=camera,
            viewmatrix=jnp.eye(4),
            campos=jnp.zeros(3),
            bg=jnp.zeros(3),
            sh_degree=1,
            config=CFG,
            means2d_ndc=ndc,
        )
        return jnp.sum(res.image)

    g = jax.grad(loss)(zeros)
    assert g.shape == (16, 2)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_tile_cap_overflow_reported():
    params, camera, vm, campos = simple_cloud(width=64, height=32)
    cfg = RasterConfig(max_instances=1 << 12, tile_cap=2, chunk=2)
    res = _tiled(params, camera, vm, campos, jnp.zeros(3), 0, cfg)
    assert int(res.overflow) >= 0  # counted, never silent


def test_depth_features_override():
    params, camera, vm, campos = simple_cloud(width=64, height=32)
    prep = preprocess(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        camera,
        vm,
        campos,
        sh_degree=0,
    )
    res = rasterize(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        camera=camera,
        viewmatrix=vm,
        campos=campos,
        bg=jnp.zeros(3),
        sh_degree=0,
        config=CFG,
        features_override=prep.depths,
    )
    img_o, _, _ = render_oracle(prep, camera, jnp.zeros(3), features=prep.depths)
    np.testing.assert_allclose(res.image, img_o, rtol=1e-5, atol=1e-5)
