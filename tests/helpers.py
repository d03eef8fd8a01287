"""Shared test fixtures: the simple_cloud scene and random Gaussian clouds.

simple_cloud mirrors `/root/reference/examples/simple_cloud.cpp:126-230`:
3 colored Gaussians (red/green/blue) at hand-placed positions, identity pose,
raw scaling −0.3 (→ exp), raw opacity 5 (→ sigmoid), SH dc from RGB2SH.
"""

import jax
import jax.numpy as jnp

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.ops import sh as sh_ops


def simple_cloud(dist=2.0, width=256, height=128, n_sh=16):
    pts = jnp.array(
        [
            [dist, -5 * dist, dist],
            [-dist, 0.5 * dist, -0.7 * dist],
            [dist, dist, -dist],
        ],
        dtype=jnp.float32,
    )
    colors = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], dtype=jnp.float32)
    sh = jnp.zeros((3, n_sh, 3), dtype=jnp.float32)
    sh = sh.at[:, 0, :].set(sh_ops.rgb2sh(colors))
    params = dict(
        means3d=pts,
        scales=jnp.exp(jnp.full((3, 3), -0.3)),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (3, 1)),
        opacities=jax.nn.sigmoid(jnp.full((3,), 5.0)),
        shs=sh,
    )
    camera = Camera(CameraType.LONLAT, width, height)
    viewmatrix = jnp.eye(4, dtype=jnp.float32)
    campos = jnp.zeros(3, dtype=jnp.float32)
    return params, camera, viewmatrix, campos


def random_cloud(key, n, spread=4.0, n_sh=16, min_r=1.0):
    """Random valid Gaussians surrounding the origin (outside the near-sphere)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d = jax.random.normal(k1, (n, 3))
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
    r = min_r + jax.random.uniform(k2, (n, 1)) * spread
    means = d * r
    quats = jax.random.normal(k3, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    scales = jnp.exp(jax.random.normal(k4, (n, 3)) * 0.3 - 1.5)
    # cap below 0.97 so α never hits the 0.99 clamp (whose backward the
    # tile rasterizer intentionally treats reference-style, unlike autodiff)
    opac = jax.nn.sigmoid(jax.random.normal(k5, (n,)) * 2.0) * 0.97
    sh = jax.random.normal(jax.random.PRNGKey(7), (n, n_sh, 3)) * 0.3
    return dict(means3d=means, scales=scales, quats=quats, opacities=opac, shs=sh)
