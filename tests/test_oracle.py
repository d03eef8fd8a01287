"""M0 oracle rasterizer: simple_cloud semantics + differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import lonlat_project, world_to_cam
from omnigs_tpu.ops.oracle import render_oracle
from omnigs_tpu.ops.preprocess import preprocess

from helpers import random_cloud, simple_cloud


def _prep(params, camera, vm, campos, deg=0):
    return preprocess(
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


def test_simple_cloud_blobs():
    params, camera, vm, campos = simple_cloud()
    prep = _prep(params, camera, vm, campos)
    img, final_T, n_contrib = render_oracle(prep, camera, jnp.zeros(3))
    assert img.shape == (3, camera.height, camera.width)

    # each Gaussian produces a blob of its own color at its projected pixel
    t = world_to_cam(params["means3d"], vm)
    pix, _, _ = lonlat_project(t, camera.width, camera.height)
    for i, ch in enumerate([0, 1, 2]):
        x = int(round(float(pix[i, 0])))
        y = int(round(float(pix[i, 1])))
        val = img[:, y, x]
        assert float(val[ch]) > 0.5, (i, np.asarray(val))
        other = [c for c in range(3) if c != ch]
        assert float(val[other[0]]) < 0.3
        assert float(val[other[1]]) < 0.3
        assert float(final_T[y, x]) < 0.2
        assert int(n_contrib[y, x]) >= 1

    # background pixels stay background
    assert float(img[:, 0, 0].sum()) < 1e-3
    assert float(final_T[0, 0]) == 1.0


def test_background_composited():
    params, camera, vm, campos = simple_cloud()
    prep = _prep(params, camera, vm, campos)
    bg = jnp.array([0.25, 0.5, 0.75])
    img, final_T, _ = render_oracle(prep, camera, bg)
    np.testing.assert_allclose(
        np.asarray(img[:, 0, 0]), np.asarray(bg), atol=1e-6
    )


def test_oracle_gradients_finite_diff():
    from omnigs_tpu.cameras import Camera, CameraType

    camera = Camera(CameraType.LONLAT, 64, 32)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    params = random_cloud(jax.random.PRNGKey(0), 24)
    target = jnp.ones((3, camera.height, camera.width)) * 0.3

    def loss(means, scales, quats, opac, shs):
        prep = preprocess(
            means, scales, quats, opac, shs, camera, vm, campos, sh_degree=2
        )
        img, _, _ = render_oracle(prep, camera, jnp.zeros(3))
        return jnp.mean((img - target) ** 2)

    args = (
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
    )
    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for gi in g:
        assert bool(jnp.isfinite(gi).all())
    # at least positions and opacities receive signal
    assert float(jnp.abs(g[0]).max()) > 0
    assert float(jnp.abs(g[3]).max()) > 0

    # finite-difference check on a single scalar direction (opacity of g0)
    eps = 1e-3
    v = jnp.zeros_like(params["opacities"]).at[0].set(1.0)
    f0 = loss(*args)
    fp = loss(args[0], args[1], args[2], args[3] + eps * v, args[4])
    fm = loss(args[0], args[1], args[2], args[3] - eps * v, args[4])
    fd = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(float(g[3][0]), float(fd), rtol=5e-2, atol=1e-5)


def test_early_termination_semantics():
    """Stacked opaque Gaussians: far ones must not contribute once T < 1e-4."""
    from omnigs_tpu.cameras import Camera, CameraType

    camera = Camera(CameraType.LONLAT, 64, 32)
    n = 12
    # all at +z, increasing depth, nearly opaque
    means = jnp.stack(
        [jnp.zeros(n), jnp.zeros(n), jnp.linspace(1.0, 2.0, n)], axis=-1
    )
    params = dict(
        means3d=means,
        scales=jnp.full((n, 3), 0.5),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        opacities=jnp.full((n,), 0.98),
        shs=jnp.zeros((n, 16, 3)).at[:, 0, :].set(1.0),
    )
    prep = _prep(params, camera, jnp.eye(4), jnp.zeros(3))
    img, final_T, n_contrib = render_oracle(prep, camera, jnp.zeros(3))
    cx, cy = (camera.width - 1) // 2, (camera.height - 1) // 2
    # T after k layers ≈ 0.02^k < 1e-4 at k=3 ⇒ only ~3 contributors
    assert int(n_contrib[cy, cx]) <= 4
    assert float(final_T[cy, cx]) < 1e-3
