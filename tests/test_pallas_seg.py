"""Segmented-chunk kernels (RasterConfig.segmented, ops/pallas_seg.py):
one kernel pass per 128-lane slab chunk with per-lane tile windows must
reproduce the tile-major Pallas path — image, final_T and all five
parameter gradients — across the production knob combinations
(VERDICT r4 next-round #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.ops.rasterize import RasterConfig, rasterize

from helpers import random_cloud

CAMERA = Camera(CameraType.LONLAT, 128, 64)


def _render(params, cfg, bg=0.2):
    return rasterize(
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"],
        camera=CAMERA, viewmatrix=jnp.eye(4), campos=jnp.zeros(3),
        bg=jnp.full(3, bg), sh_degree=2, config=cfg,
    )


def _grads(params, cfg):
    def loss(m, s, q, o, sh):
        res = rasterize(
            m, s, q, o, sh, camera=CAMERA, viewmatrix=jnp.eye(4),
            campos=jnp.zeros(3), bg=jnp.zeros(3), sh_degree=2, config=cfg,
        )
        w = jnp.linspace(0.5, 1.5, res.image.size).reshape(res.image.shape)
        return jnp.sum(res.image * w)

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"],
    )


@pytest.mark.parametrize("tile_culling", [False, True])
def test_seg_forward_matches_compact(tile_culling):
    params = random_cloud(jax.random.PRNGKey(3), 96)
    base = dict(
        max_instances=1 << 12, backend="pallas", interpret=True,
        tile_culling=tile_culling, want_ncontrib=False,
    )
    r_ref = _render(params, RasterConfig(**base))
    r_seg = _render(params, RasterConfig(segmented=True, **base))
    # same math, different chunk grouping: f32 summation-order noise only
    np.testing.assert_allclose(
        np.asarray(r_seg.image), np.asarray(r_ref.image), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_seg.final_T), np.asarray(r_ref.final_T), atol=1e-5
    )
    assert int(r_seg.truncated) == int(r_ref.truncated) == 0


@pytest.mark.parametrize(
    "gather_reduce,depth_presort",
    [(False, False), (True, False), (True, True)],
)
def test_seg_grads_match_compact(gather_reduce, depth_presort):
    params = random_cloud(jax.random.PRNGKey(5), 96)
    base = dict(
        max_instances=1 << 12, backend="pallas", interpret=True,
        tile_culling=True, gather_reduce=gather_reduce,
        depth_presort=depth_presort, want_ncontrib=False,
    )
    g_ref = _grads(params, RasterConfig(**base))
    g_seg = _grads(params, RasterConfig(segmented=True, **base))
    for a, b, name in zip(
        g_ref, g_seg, ["means", "scales", "quats", "opac", "shs"]
    ):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=1e-4 * np.abs(a).max() + 1e-8,
            err_msg=f"{name} gather={gather_reduce} presort={depth_presort}",
        )


def test_seg_cap_trim_counts_truncation():
    """Tiles whose 8-padded segment crosses the r8 cap are dropped
    deterministically and counted (aligned_cap semantics)."""
    params = random_cloud(jax.random.PRNGKey(5), 96)
    base = dict(
        max_instances=1 << 12, backend="pallas", interpret=True,
        want_ncontrib=False,
    )
    full = _render(params, RasterConfig(segmented=True, **base))
    trimmed = _render(
        params,
        RasterConfig(segmented=True, aligned_cap=256, **base),
    )
    assert int(full.truncated) == 0
    assert int(trimmed.truncated) > 0
    assert bool(jnp.isfinite(trimmed.image).all())


def test_seg_multichunk_tiles():
    """Tiles spanning several 128-lane chunks exercise the chunk-boundary
    and program-boundary carries: concentrate many Gaussians so tiles have
    hundreds of instances."""
    params = random_cloud(jax.random.PRNGKey(7), 256)
    # shrink spread so instances pile into few tiles
    params = dict(params)
    params["means3d"] = params["means3d"] * jnp.array([0.3, 0.3, 1.0])
    base = dict(
        max_instances=1 << 13, backend="pallas", interpret=True,
        want_ncontrib=False,
    )
    r_ref = _render(params, RasterConfig(**base))
    r_seg = _render(params, RasterConfig(segmented=True, **base))
    np.testing.assert_allclose(
        np.asarray(r_seg.image), np.asarray(r_ref.image), atol=2e-5
    )
    g_ref = _grads(params, RasterConfig(**base))
    g_seg = _grads(params, RasterConfig(segmented=True, **base))
    for a, b in zip(g_ref, g_seg):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=1e-4 * np.abs(a).max() + 1e-8
        )
