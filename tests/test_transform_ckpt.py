"""Point-ops (markVisible / Sim3 transforms / increasePcd) + orbax resume."""

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import CameraType
from omnigs_tpu.model import optimizer as O
from omnigs_tpu.model import transform as T
from omnigs_tpu.model.gaussians import from_pcd
from omnigs_tpu.ops.covariance import quat_to_rotmat
from omnigs_tpu.ops.knn import mean_sq_knn_dist


def _model(cap=16):
    pts = jnp.array([[2.0, 0, 0], [0, 2.0, 0], [0, 0, 2.0], [0, 0, -2.0]])
    cols = jnp.full((4, 3), 0.5)
    return from_pcd(pts, cols, cap, mean_sq_knn_dist(pts))


def test_mark_visible_lonlat_all():
    m = _model()
    vis = T.mark_visible(m.xyz, jnp.eye(4), CameraType.LONLAT)
    assert bool(vis.all())  # reference quirk: lonlat marks everything


def test_mark_visible_pinhole_near_cull():
    m = _model()
    vis = T.mark_visible(m.xyz, jnp.eye(4), CameraType.PINHOLE)
    # only the point at z=+2 is in front; z=-2 behind; x/y points have z=0
    assert bool(vis[2])
    assert not bool(vis[3])
    assert not bool(vis[0])


def test_rotmat_quat_roundtrip():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (4,))
    q = q / jnp.linalg.norm(q)
    q = jnp.where(q[0] < 0, -q, q)  # canonical sign
    R = quat_to_rotmat(q)
    q2 = T.rotmat_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_apply_scaled_transformation():
    m = _model()
    st = O.init_adam(m.params())
    st = st.replace(mu={**st.mu, "xyz": st.mu["xyz"] + 1.0})
    s = 2.0
    angle = 0.5
    c, si = np.cos(angle), np.sin(angle)
    Tm = jnp.asarray(
        np.array(
            [[c, -si, 0, 1.0], [si, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float32,
        )
    )
    m2, st2 = T.apply_scaled_transformation(m, st, s, Tm)
    want = (s * np.asarray(m.xyz)) @ np.asarray(Tm[:3, :3]).T + np.asarray(
        Tm[:3, 3]
    )
    np.testing.assert_allclose(np.asarray(m2.xyz), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m2.get_scaling()[:4]),
        np.asarray(m.get_scaling()[:4]) * s,
        rtol=1e-5,
    )
    assert float(st2.mu["xyz"].sum()) == 0.0  # moments zeroed


def test_scaled_transform_visible_points():
    m = _model()
    m = m.replace(exist_since_iter=m.exist_since_iter.at[:4].set(100))
    st = O.init_adam(m.params())
    not_t = jnp.ones((16,), bool)
    shift = jnp.eye(4).at[0, 3].set(1.0)
    m2, st2, not_t2, n = T.scaled_transform_visible_points(
        m, st, not_t, shift, jnp.eye(4), 100, 50, CameraType.LONLAT
    )
    assert int(n) == 4  # all active points unstable+visible
    np.testing.assert_allclose(
        np.asarray(m2.xyz[:4, 0]), np.asarray(m.xyz[:4, 0]) + 1.0, rtol=1e-6
    )
    assert not bool(not_t2[:4].any())
    # inactive slots untouched
    np.testing.assert_allclose(np.asarray(m2.xyz[4:]), np.asarray(m.xyz[4:]))


def test_increase_pcd():
    m = _model()
    st = O.init_adam(m.params())
    new_pts = jnp.array([[5.0, 5, 5], [6.0, 6, 6]])
    new_cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    d2 = mean_sq_knn_dist(jnp.concatenate([m.xyz[:4], new_pts]))[4:]
    m2, st2, dropped = T.increase_pcd(m, st, new_pts, new_cols, d2, 42)
    assert int(dropped) == 0
    assert int(m2.num_active) == 6
    slots = np.where(np.asarray(m2.active) & (np.arange(16) >= 4))[0]
    assert len(slots) == 2
    got = np.sort(np.asarray(m2.xyz[slots])[:, 0])
    np.testing.assert_allclose(got, [5.0, 6.0])
    assert int(m2.exist_since_iter[slots[0]]) == 42


def test_checkpoint_roundtrip(tmp_path):
    from omnigs_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    m = _model()
    st = O.init_adam(m.params())
    st = st.replace(count=jnp.asarray(7, jnp.int32))
    save_checkpoint(tmp_path / "ckpt", m, st, 123)
    m2, st2, it, _ = load_checkpoint(tmp_path / "ckpt", capacity=16)
    assert it == 123
    assert int(st2.count) == 7
    np.testing.assert_allclose(np.asarray(m2.xyz), np.asarray(m.xyz))
    np.testing.assert_array_equal(np.asarray(m2.active), np.asarray(m.active))
