"""ParallelTrainer end-to-end on the virtual 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.config import Config
from omnigs_tpu.train.trainer_parallel import ParallelTrainer

from test_trainer import _make_scene

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_parallel_training_learns():
    camera = Camera(CameraType.LONLAT, 64, 32)
    scene = _make_scene(camera, n_views=4, seed=0)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu,
        capacity=128,  # 16 per gauss shard
        max_instances=1 << 12,
        tile_cap=64,
        chunk=8,
        backend="xla",
        mesh_data=2,
        mesh_gauss=4,
    )
    cfg.opt.densify_from_iter = 10
    cfg.opt.densification_interval = 10
    cfg.opt.densify_until_iter = 25
    cfg.opt.opacity_reset_interval = 0
    cfg.opt.position_lr_max_steps = 30

    tr = ParallelTrainer(scene, cfg)
    tr.init_from_sfm()
    losses = [tr.train_iteration() for _ in range(30)]
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    # model stayed sharded and finite
    for leaf in jax.tree_util.tree_leaves(tr.model):
        if leaf.dtype != bool:
            assert bool(jnp.isfinite(leaf).all())


def test_fused_window_matches_single_steps():
    """Sharded scan windows reproduce the per-step path losses exactly."""
    import dataclasses

    import numpy as np

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.config import Config
    from omnigs_tpu.train.trainer_parallel import ParallelTrainer
    from test_trainer import _make_scene

    camera = Camera(CameraType.LONLAT, 32, 16)
    scene = _make_scene(camera, n_views=3, seed=9)

    def cfg():
        c = Config()
        c.tpu = dataclasses.replace(
            c.tpu, capacity=64, max_instances=1 << 12, tile_cap=64, chunk=8,
            mesh_data=2, mesh_gauss=4, backend="xla", fuse_steps=3,
        )
        c.opt.densify_from_iter = 1000
        c.opt.opacity_reset_interval = 0
        return c

    tr_a = ParallelTrainer(scene, cfg(), seed=2)
    tr_a.init_from_sfm()
    for _ in range(6):
        tr_a.train_iteration()
    la = [float(x[0]) for x in tr_a._pending_losses]

    tr_b = ParallelTrainer(scene, cfg(), seed=2)
    tr_b.init_from_sfm()
    steps = 0
    while steps < 6:
        took = tr_b.train_window(min(3, 6 - steps))
        if took == 0:
            tr_b.train_iteration()
            took = 1
        steps += took
    lb = []
    for x in tr_b._pending_losses:
        lb.extend(np.atleast_1d(np.asarray(x[0])).tolist())
    np.testing.assert_allclose(lb, la, rtol=1e-6)
