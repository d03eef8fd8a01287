"""Covariance construction and EWA projection tests."""

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.ops import covariance as C


def test_quat_identity():
    np.testing.assert_allclose(
        C.quat_to_rotmat(jnp.array([1.0, 0, 0, 0])), jnp.eye(3), atol=1e-7
    )


def test_quat_rotation_properties():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (16, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R = C.quat_to_rotmat(q)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(16), atol=1e-5)


def test_quat_90deg_z():
    # 90° about z: (w, x, y, z) = (cos45, 0, 0, sin45); x axis → y axis
    s = float(np.sqrt(0.5))
    R = C.quat_to_rotmat(jnp.array([s, 0.0, 0.0, s]))
    np.testing.assert_allclose(R @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_cov3d_equals_rssr():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (8, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    s = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (8, 3)))
    packed = C.build_cov3d(s, q)
    sigma = C.unpack_cov3d(packed)
    R = C.quat_to_rotmat(q)
    want = R @ (s[..., None] ** 2 * jnp.swapaxes(R, -1, -2))
    np.testing.assert_allclose(sigma, want, rtol=1e-5, atol=1e-5)
    # PSD
    eig = jnp.linalg.eigvalsh(sigma)
    assert float(eig.min()) > 0


def test_project_invert_roundtrip():
    key = jax.random.PRNGKey(3)
    J = jax.random.normal(key, (4, 2, 3))
    Rcw = C.quat_to_rotmat(
        jax.random.normal(jax.random.PRNGKey(4), (4,))
        / jnp.linalg.norm(jax.random.normal(jax.random.PRNGKey(4), (4,)))
    )
    cov6 = C.build_cov3d(jnp.ones((4, 3)) * 0.5, jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1)))
    cov2d = C.project_cov3d(cov6, J, Rcw)
    conic, det = C.invert_cov2d(cov2d)
    # conic really is the inverse
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    A, B, Cc = conic[..., 0], conic[..., 1], conic[..., 2]
    np.testing.assert_allclose(a * A + b * B, jnp.ones(4), rtol=1e-5)
    np.testing.assert_allclose(a * B + b * Cc, jnp.zeros(4), atol=1e-5)
    radii = C.cov2d_extent(cov2d, det)
    assert (radii > 0).all()


def test_low_pass_floor():
    # tiny Gaussian: cov2d diag must be >= 0.3
    cov6 = C.build_cov3d(jnp.full((1, 3), 1e-4), jnp.array([[1.0, 0, 0, 0]]))
    J = jnp.eye(3)[None, :2, :]
    cov2d = C.project_cov3d(cov6, J, jnp.eye(3))
    assert float(cov2d[0, 0]) >= 0.3
    assert float(cov2d[0, 2]) >= 0.3
