"""Pallas compositing kernels vs the XLA compositor (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.ops.rasterize import RasterConfig, rasterize

from helpers import random_cloud, simple_cloud

XLA_CFG = RasterConfig(max_instances=1 << 13, tile_cap=256, chunk=8)
PAL_CFG = RasterConfig(
    max_instances=1 << 13, backend="pallas", interpret=True
)


def _render(params, camera, vm, campos, bg, deg, cfg, ndc=None):
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
        means2d_ndc=ndc,
    )


def test_pallas_fwd_matches_xla_simple_cloud():
    params, camera, vm, campos = simple_cloud(width=64, height=32)
    bg = jnp.array([0.1, 0.2, 0.3])
    ref = _render(params, camera, vm, campos, bg, 0, XLA_CFG)
    got = _render(params, camera, vm, campos, bg, 0, PAL_CFG)
    np.testing.assert_allclose(got.image, ref.image, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got.final_T, ref.final_T, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got.n_contrib, ref.n_contrib)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_fwd_matches_xla_random(seed):
    camera = Camera(CameraType.LONLAT, 64, 32)
    params = random_cloud(jax.random.PRNGKey(seed), 32)
    bg = jnp.zeros(3)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    ref = _render(params, camera, vm, campos, bg, 2, XLA_CFG)
    got = _render(params, camera, vm, campos, bg, 2, PAL_CFG)
    np.testing.assert_allclose(got.image, ref.image, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.final_T, ref.final_T, rtol=1e-4, atol=1e-6)


def test_pallas_bwd_matches_xla():
    camera = Camera(CameraType.LONLAT, 64, 32)
    params = random_cloud(jax.random.PRNGKey(2), 24)
    bg = jnp.array([0.3, 0.3, 0.3])
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    target = jnp.linspace(0, 1, 32 * 64 * 3).reshape(3, 32, 64)

    def loss(cfg):
        def f(means, scales, quats, opac, shs):
            p = dict(
                means3d=means, scales=scales, quats=quats, opacities=opac,
                shs=shs,
            )
            res = _render(p, camera, vm, campos, bg, 2, cfg)
            return jnp.mean((res.image - target) ** 2)

        return f

    args = (
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
    )
    g_ref = jax.grad(loss(XLA_CFG), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss(PAL_CFG), argnums=(0, 1, 2, 3, 4))(*args)
    for go, gp, name in zip(
        g_ref, g_pal, ["means", "scales", "quats", "opacity", "sh"]
    ):
        scale = float(jnp.abs(go).max()) + 1e-12
        np.testing.assert_allclose(
            gp, go, rtol=1e-3, atol=1e-4 * scale, err_msg=name
        )


def test_pallas_fused_reduce_grads_match():
    """fused_reduce=True (in-kernel per-Gaussian accumulation) must produce
    the same gradients as the unfused scatter-add path."""
    camera = Camera(CameraType.LONLAT, 64, 32)
    params = random_cloud(jax.random.PRNGKey(7), 48)
    bg = jnp.array([0.2, 0.1, 0.0])
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    target = jnp.linspace(1, 0, 32 * 64 * 3).reshape(3, 32, 64)
    cfg_f = dataclasses.replace(PAL_CFG, fused_reduce=True, tile_culling=True)
    cfg_u = dataclasses.replace(PAL_CFG, tile_culling=True)

    def loss(cfg):
        def f(means, scales, quats, opac, shs):
            p = dict(
                means3d=means, scales=scales, quats=quats, opacities=opac,
                shs=shs,
            )
            res = _render(p, camera, vm, campos, bg, 2, cfg)
            return jnp.mean((res.image - target) ** 2)

        return f

    args = (
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"],
    )
    g_u = jax.grad(loss(cfg_u), argnums=(0, 1, 2, 3, 4))(*args)
    g_f = jax.grad(loss(cfg_f), argnums=(0, 1, 2, 3, 4))(*args)
    for gu, gf, name in zip(
        g_u, g_f, ["means", "scales", "quats", "opacity", "sh"]
    ):
        scale = float(jnp.abs(gu).max()) + 1e-12
        np.testing.assert_allclose(
            gf, gu, rtol=1e-5, atol=1e-6 * scale, err_msg=name
        )


def test_pallas_ndc_grads():
    camera = Camera(CameraType.LONLAT, 64, 32)
    params = random_cloud(jax.random.PRNGKey(3), 16)
    zeros = jnp.zeros((16, 2))

    def loss(ndc):
        res = _render(
            params, camera, jnp.eye(4), jnp.zeros(3), jnp.zeros(3), 1,
            PAL_CFG, ndc,
        )
        return jnp.sum(res.image)

    g = jax.grad(loss)(zeros)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_ghost_and_compact_layouts_agree():
    """The ghost-aligned and compact slab layouts are two physical layouts
    of the same composited instance sequence — images, final_T, n_contrib,
    and gradients must match exactly-ish."""
    camera = Camera(CameraType.LONLAT, 64, 32)
    bg = jnp.array([0.05, 0.1, 0.15])
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    ghost_cfg = dataclasses.replace(PAL_CFG, ghost_align=True)
    params = random_cloud(jax.random.PRNGKey(11), 48)
    ref = _render(params, camera, vm, campos, bg, 2, ghost_cfg)
    got = _render(params, camera, vm, campos, bg, 2, PAL_CFG)
    np.testing.assert_allclose(got.image, ref.image, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got.final_T, ref.final_T, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(got.n_contrib, ref.n_contrib)

    target = jnp.linspace(0, 1, 32 * 64 * 3).reshape(3, 32, 64)

    def loss(cfg):
        def f(means, scales, quats, opac, shs):
            p = dict(
                means3d=means, scales=scales, quats=quats, opacities=opac,
                shs=shs,
            )
            res = _render(p, camera, vm, campos, bg, 2, cfg)
            return jnp.mean((res.image - target) ** 2)

        return f

    args = (
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"],
    )
    g_ref = jax.grad(loss(ghost_cfg), argnums=(0, 1, 2, 3, 4))(*args)
    g_cmp = jax.grad(loss(PAL_CFG), argnums=(0, 1, 2, 3, 4))(*args)
    for go, gp, name in zip(
        g_ref, g_cmp, ["means", "scales", "quats", "opacity", "sh"]
    ):
        scale = float(jnp.abs(go).max()) + 1e-12
        np.testing.assert_allclose(
            gp, go, rtol=1e-5, atol=1e-6 * scale, err_msg=name
        )


def test_pallas_tile_culling_output_identical():
    """Exact ellipse-box culling must not change image or final_T (it only
    drops instances that composite exactly zero for every pixel)."""
    camera = Camera(CameraType.LONLAT, 64, 32)
    bg = jnp.array([0.2, 0.1, 0.4])
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    cull_cfg = dataclasses.replace(PAL_CFG, tile_culling=True)
    for seed in (0, 5):
        params = random_cloud(jax.random.PRNGKey(seed), 40)
        ref = _render(params, camera, vm, campos, bg, 2, PAL_CFG)
        got = _render(params, camera, vm, campos, bg, 2, cull_cfg)
        np.testing.assert_allclose(got.image, ref.image, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            got.final_T, ref.final_T, rtol=1e-5, atol=1e-7
        )


def test_pallas_tile_culling_grads_match():
    camera = Camera(CameraType.LONLAT, 64, 32)
    params = random_cloud(jax.random.PRNGKey(7), 24)
    bg = jnp.zeros(3)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    target = jnp.linspace(0, 1, 32 * 64 * 3).reshape(3, 32, 64)
    cull_cfg = dataclasses.replace(PAL_CFG, tile_culling=True)

    def loss(cfg):
        def f(means, scales, quats, opac, shs):
            p = dict(
                means3d=means, scales=scales, quats=quats, opacities=opac,
                shs=shs,
            )
            res = _render(p, camera, vm, campos, bg, 2, cfg)
            return jnp.mean((res.image - target) ** 2)

        return f

    args = (
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"],
    )
    g_ref = jax.grad(loss(PAL_CFG), argnums=(0, 1, 2, 3, 4))(*args)
    g_cul = jax.grad(loss(cull_cfg), argnums=(0, 1, 2, 3, 4))(*args)
    for go, gp, name in zip(
        g_ref, g_cul, ["means", "scales", "quats", "opacity", "sh"]
    ):
        scale = float(jnp.abs(go).max()) + 1e-12
        np.testing.assert_allclose(
            gp, go, rtol=1e-4, atol=1e-6 * scale, err_msg=name
        )


def test_final_t_cotangent_check(monkeypatch):
    """CONTRACT (pallas_raster._ci_bwd): color is the only differentiable
    output. A loss consuming final_T silently gets zero gradient through
    it; with OMNIGS_CHECK_COTANGENTS=1 that must fail LOUDLY (NaN poison)
    instead (VERDICT r3 weak #4)."""
    from omnigs_tpu.ops.binning import bin_instances
    from omnigs_tpu.ops.pallas_raster import composite_instances
    from omnigs_tpu.ops.preprocess import TILE, preprocess, tile_grid

    camera = Camera(CameraType.LONLAT, 64, 32)
    gx, gy = tile_grid(camera)
    params = random_cloud(jax.random.PRNGKey(2), 16)
    prep = preprocess(
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"], camera, jnp.eye(4),
        jnp.zeros(3), 0,
    )
    inst = bin_instances(prep, gx, gy, 1 << 10)
    t_ids = np.arange(gx * gy)
    x0 = jnp.asarray((t_ids % gx) * TILE, jnp.int32)
    y0 = jnp.asarray((t_ids // gx) * TILE, jnp.int32)

    def loss_T(opacity):
        _, finalT, _ = composite_instances(
            prep.means2d, prep.conic, prep.rgb, opacity, jnp.zeros(3),
            inst.sorted_g, inst.starts, inst.counts, x0, y0,
            None, None, None, None, None, gx * gy, True,
        )
        return jnp.sum(finalT)

    # without the flag: the dropped cotangent silently yields zero grads
    g = jax.grad(loss_T)(prep.opacity)
    assert float(jnp.abs(g).max()) == 0.0
    # with the flag: loud NaN poison
    monkeypatch.setenv("OMNIGS_CHECK_COTANGENTS", "1")
    g = jax.grad(loss_T)(prep.opacity)
    assert bool(jnp.isnan(g).any())
