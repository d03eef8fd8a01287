"""Camera projection + Jacobian unit tests (vs autodiff of the projection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnigs_tpu.cameras import (
    lonlat_jacobian,
    lonlat_project,
    ndc2pix,
    pinhole_jacobian,
    world_to_cam,
)


def test_lonlat_landmarks():
    W, H = 512, 256
    pts = jnp.array(
        [
            [0.0, 0.0, 1.0],  # forward (+z): image center
            [1.0, 0.0, 0.0],  # right (+x): lon = +pi/2 → 3/4 width
            [0.0, 0.999, 0.001],  # down (+y): lat → +pi/2 → bottom
        ]
    )
    pix, depth, valid = lonlat_project(pts, W, H)
    np.testing.assert_allclose(pix[0], [(W - 1) / 2, (H - 1) / 2], atol=1e-4)
    np.testing.assert_allclose(pix[1, 0], ndc2pix(0.5, W), atol=1e-4)
    assert pix[2, 1] > 0.95 * H
    np.testing.assert_allclose(depth, jnp.linalg.norm(pts, axis=-1), rtol=1e-5)
    assert bool(valid.all())


def test_lonlat_near_cull():
    pts = jnp.array([[0.01, 0.01, 0.01], [1.0, 0.0, 0.0]])
    _, _, valid = lonlat_project(pts, 64, 32)
    assert not bool(valid[0])
    assert bool(valid[1])


@pytest.mark.parametrize("seed", [0, 1])
def test_lonlat_jacobian_matches_autodiff(seed):
    W, H = 640, 320
    key = jax.random.PRNGKey(seed)
    t = jax.random.normal(key, (32, 3)) * 3.0
    # keep away from the pole/origin singularities where the eps guards differ
    t = t.at[:, 1].multiply(0.5)
    r = jnp.linalg.norm(t, axis=-1)
    t = t[r > 0.5]

    def pix_fn(p):
        pix, _, _ = lonlat_project(p[None], W, H)
        return pix[0]

    J_ref = jax.vmap(jax.jacfwd(pix_fn))(t)
    J = lonlat_jacobian(t, W, H)
    np.testing.assert_allclose(J, J_ref, rtol=2e-4, atol=2e-4)


def test_pinhole_jacobian_matches_formula():
    fx = fy = 300.0
    tanx = tany = 0.8
    t = jnp.array([[0.3, -0.2, 2.0]])
    J = pinhole_jacobian(t, fx, fy, tanx, tany)

    def pix_fn(p):
        return jnp.stack([fx * p[0] / p[2], fy * p[1] / p[2]])

    J_ref = jax.jacfwd(pix_fn)(t[0])
    np.testing.assert_allclose(J[0], J_ref, rtol=1e-5, atol=1e-5)


def test_world_to_cam_roundtrip():
    key = jax.random.PRNGKey(0)
    # random rigid transform
    q = jax.random.normal(key, (4,))
    q = q / jnp.linalg.norm(q)
    from omnigs_tpu.ops.covariance import quat_to_rotmat

    R = quat_to_rotmat(q)
    tr = jnp.array([0.5, -1.0, 2.0])
    vm = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(tr)
    p = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    t = world_to_cam(p, vm)
    np.testing.assert_allclose(t, p @ R.T + tr, rtol=1e-6, atol=1e-6)
