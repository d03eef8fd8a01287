"""End-to-end training smoke test on a tiny synthetic scene.

Mini version of BASELINE config 2/3: ground truth rendered from a known
Gaussian cloud, model initialized from a perturbed point cloud, trained for
a few dozen iterations through the full mapper path (stats, densify, opacity
reset, Adam) — loss must drop and everything must stay finite.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.config import Config
from omnigs_tpu.ops.rasterize import RasterConfig
from omnigs_tpu.scene.keyframe import Keyframe
from omnigs_tpu.scene.scene import Scene
from omnigs_tpu.train.renderer import render_model
from omnigs_tpu.train.trainer import Trainer

from helpers import random_cloud


def _make_scene(camera, n_views=3, seed=0):
    """GT images rendered from a random reference cloud."""
    from omnigs_tpu.model.gaussians import GaussianModel

    params = random_cloud(jax.random.PRNGKey(seed), 48)
    gt_model = GaussianModel.empty(48)
    gt_model = gt_model.replace(
        xyz=params["means3d"],
        scaling=jnp.log(params["scales"]),
        rotation=params["quats"],
        opacity=jnp.log(
            params["opacities"] / (1 - params["opacities"])
        )[:, None],
        features_dc=params["shs"][:, :1, :],
        features_rest=params["shs"][:, 1:, :],
        active=jnp.ones(48, bool),
    )
    cfg = RasterConfig(max_instances=1 << 14, tile_cap=128, chunk=8)
    scene = Scene()
    rng = np.random.default_rng(seed)
    for i in range(n_views):
        # small random rotations around origin
        angle = rng.normal() * 0.2
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = rng.normal(size=3).astype(np.float32) * 0.1
        vm = np.eye(4, dtype=np.float32)
        vm[:3, :3] = R
        vm[:3, 3] = t
        campos = -R.T @ t
        res = render_model(
            gt_model,
            camera,
            jnp.asarray(vm),
            jnp.asarray(campos),
            jnp.zeros(3),
            sh_degree=3,
            config=cfg,
        )
        scene.add_keyframe(
            Keyframe(
                fid=i,
                camera=camera,
                R_cw=R,
                t_cw=t,
                image=np.asarray(res.image).transpose(1, 2, 0),
            )
        )
    # noisy init point cloud from the gt means
    pts = np.asarray(params["means3d"]) + rng.normal(
        size=(48, 3)
    ).astype(np.float32) * 0.05
    # colors roughly from dc
    from omnigs_tpu.ops.sh import sh2rgb

    scene.points = pts
    scene.colors = np.clip(np.asarray(sh2rgb(params["shs"][:, 0, :])), 0, 1)
    return scene


def test_training_reduces_loss():
    camera = Camera(CameraType.LONLAT, 64, 32)
    scene = _make_scene(camera)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu, capacity=128, max_instances=1 << 14, tile_cap=128, chunk=8
    )
    # compressed schedule: densify + reset exercised within 40 iters
    cfg.opt.densify_from_iter = 10
    cfg.opt.densification_interval = 10
    cfg.opt.densify_until_iter = 35
    cfg.opt.opacity_reset_interval = 0  # reset clobbers tiny runs; off here
    cfg.opt.position_lr_max_steps = 40
    cfg.mapper.new_keyframe_times_of_use = 1

    tr = Trainer(scene, cfg)
    tr.init_from_sfm()
    assert int(tr.model.num_active) == 48

    first_losses, last_losses = [], []
    for i in range(40):
        aux = tr.train_iteration()
        if i < 5:
            first_losses.append(float(aux["loss"]))
        if i >= 35:
            last_losses.append(float(aux["loss"]))
        assert np.isfinite(float(aux["loss"]))

    assert np.mean(last_losses) < np.mean(first_losses), (
        first_losses,
        last_losses,
    )
    # all parameters finite after training + densify
    for leaf in jax.tree_util.tree_leaves(tr.model):
        assert bool(jnp.isfinite(leaf).all()) or leaf.dtype == bool


def test_opacity_reset_in_loop():
    camera = Camera(CameraType.LONLAT, 32, 16)
    scene = _make_scene(camera, n_views=2, seed=1)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu, capacity=64, max_instances=1 << 12, tile_cap=64, chunk=8
    )
    cfg.opt.densify_from_iter = 1000  # no densify
    cfg.opt.opacity_reset_interval = 5
    tr = Trainer(scene, cfg)
    tr.init_from_sfm()
    for _ in range(5):
        tr.train_iteration()
    # after reset at iter 5, all active opacities ≤ 0.01
    op = np.asarray(tr.model.get_opacity())[np.asarray(tr.model.active)]
    assert (op <= 0.0101).all()


def test_fused_windows_match_single_steps():
    """`train_window` (scanned K-step device program) must reproduce the
    single-step loop exactly: same sampler sequence, same LR schedule, same
    stats — parameters agree to float tolerance."""
    camera = Camera(CameraType.LONLAT, 64, 32)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu, capacity=64, max_instances=1 << 13, tile_cap=128, chunk=8
    )
    cfg.opt.densify_from_iter = 10
    cfg.opt.densification_interval = 10
    cfg.opt.densify_until_iter = 25
    cfg.opt.opacity_reset_interval = 0
    cfg.opt.position_lr_max_steps = 30

    def run(fused):
        scene = _make_scene(camera, seed=3)
        tr = Trainer(scene, cfg, seed=7)
        tr.init_from_sfm()
        if fused:
            while tr.iteration < 30:
                took = tr.train_window(min(8, 30 - tr.iteration))
                if took == 0:
                    tr.train_iteration()
        else:
            for _ in range(30):
                tr.train_iteration()
        tr.drain_losses()
        return tr

    a, b = run(False), run(True)
    assert a.iteration == b.iteration == 30
    np.testing.assert_allclose(a.ema_loss, b.ema_loss, rtol=1e-4)
    for k in a.model.params():
        ga, gb = a.model.params()[k], b.model.params()[k]
        scale = float(jnp.abs(ga).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), rtol=1e-4,
            atol=1e-5 * scale, err_msg=k,
        )


def test_autosize_capacities():
    """Tpu.max_instances=0 sizes the emission budget from scene stats."""
    camera = Camera(CameraType.LONLAT, 32, 16)
    scene = _make_scene(camera, n_views=2, seed=4)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu, capacity=64, max_instances=0, tile_cap=64, chunk=8
    )
    cfg.opt.densify_from_iter = 1000
    cfg.opt.opacity_reset_interval = 0
    tr = Trainer(scene, cfg)
    tr.init_from_sfm()
    assert cfg.tpu.max_instances >= 1 << 16  # power-of-two floor
    assert tr.raster_cfg.max_instances == cfg.tpu.max_instances
    tr.train_iteration()  # and the sized config actually trains
    assert np.isfinite(tr.drain_losses())
