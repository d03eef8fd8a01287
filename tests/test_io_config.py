"""Config parsing + PLY round-trips + scene/sampler behavior."""

import numpy as np
import jax.numpy as jnp

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.config import load_config
from omnigs_tpu.io.ply import (
    load_gaussian_ply,
    load_points_ply,
    save_gaussian_ply,
    save_points_ply,
)
from omnigs_tpu.model.gaussians import GaussianModel
from omnigs_tpu.scene.keyframe import Keyframe
from omnigs_tpu.scene.scene import KeyframeSampler, Scene


def test_load_reference_config():
    cfg = load_config("/root/reference/cfg/lonlat/360roam_lonlat.yaml")
    assert cfg.model.sh_degree == 3
    assert cfg.opt.max_num_iterations == 32010
    assert cfg.opt.position_lr_init == 0.00016
    assert cfg.opt.densify_until_iter == 15000
    assert cfg.opt.prune_by_extent is True
    assert abs(cfg.opt.skip_bottom_ratio - 0.063) < 1e-9
    assert cfg.mapper.all_keyframes_record_interval == 8000


def test_gaussian_ply_roundtrip(tmp_path):
    import jax

    key = jax.random.PRNGKey(0)
    m = GaussianModel.empty(16)
    n = 10
    m = m.replace(
        xyz=m.xyz.at[:n].set(jax.random.normal(key, (n, 3))),
        features_dc=m.features_dc.at[:n].set(
            jax.random.normal(jax.random.PRNGKey(1), (n, 1, 3))
        ),
        features_rest=m.features_rest.at[:n].set(
            jax.random.normal(jax.random.PRNGKey(2), (n, 15, 3))
        ),
        scaling=m.scaling.at[:n].set(-2.0),
        rotation=m.rotation.at[:n].set(
            jax.random.normal(jax.random.PRNGKey(3), (n, 4))
        ),
        opacity=m.opacity.at[:n].set(0.7),
        active=m.active.at[:n].set(True),
    )
    p = tmp_path / "model.ply"
    save_gaussian_ply(p, m)
    m2 = load_gaussian_ply(p, capacity=32)
    assert m2.capacity == 32
    assert int(m2.num_active) == n
    for name in ["xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity"]:
        np.testing.assert_allclose(
            np.asarray(getattr(m2, name))[:n],
            np.asarray(getattr(m, name))[:n],
            rtol=1e-6,
            err_msg=name,
        )


def test_points_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32)
    cols = np.random.default_rng(1).random((20, 3)).astype(np.float32)
    p = tmp_path / "points.ply"
    save_points_ply(p, pts, cols)
    pts2, cols2 = load_points_ply(p)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)


def _scene_with_kfs(n=4):
    cam = Camera(CameraType.LONLAT, 64, 32)
    scene = Scene()
    rng = np.random.default_rng(0)
    for i in range(n):
        scene.add_keyframe(
            Keyframe(
                fid=i,
                camera=cam,
                R_cw=np.eye(3, dtype=np.float32),
                t_cw=rng.normal(size=3).astype(np.float32),
                image=np.zeros((32, 64, 3), np.float32),
            )
        )
    return scene


def test_nerfpp_norm():
    scene = _scene_with_kfs()
    translate, radius = scene.nerfpp_norm()
    centers = np.stack([kf.campos for kf in scene.keyframes.values()])
    np.testing.assert_allclose(translate, -centers.mean(0), rtol=1e-5)
    want = np.linalg.norm(centers - centers.mean(0), axis=-1).max() * 1.1
    np.testing.assert_allclose(radius, want, rtol=1e-5)


def test_keyframe_sampler_budget():
    scene = _scene_with_kfs(3)
    s = KeyframeSampler(scene, times_of_use=2, seed=0)
    seen = [s.sample().fid for _ in range(6)]
    # every keyframe used exactly its budget within the epoch
    for fid in range(3):
        assert seen.count(fid) == 2
    # next epoch refills
    assert s.sample().fid in range(3)


def test_viewmatrix_campos_consistency():
    rng = np.random.default_rng(2)
    from omnigs_tpu.ops.covariance import quat_to_rotmat

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    t = rng.normal(size=3).astype(np.float32)
    kf = Keyframe(0, Camera(CameraType.LONLAT, 8, 4), R.astype(np.float32), t)
    # camera center maps to origin in camera frame
    p = kf.viewmatrix @ np.append(kf.campos, 1.0)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)


def test_round4_raster_knob_defaults(tmp_path):
    """The round-4 perf paths are ON by default in config-driven pipelines
    (measured e2e winners, BENCH.md r4) and YAML-overridable."""
    from omnigs_tpu.config import TpuParams, load_config

    assert TpuParams.gather_reduce is True
    assert TpuParams.depth_presort is True

    p = tmp_path / "knobs.yaml"
    p.write_text(
        "%YAML:1.0\n---\nTpu.gather_reduce: 0\nTpu.depth_presort: 0\n"
    )
    cfg = load_config(str(p))
    assert cfg.tpu.gather_reduce is False
    assert cfg.tpu.depth_presort is False
