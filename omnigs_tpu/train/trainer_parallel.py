"""Multi-device trainer: view-parallel batches × Gaussian-sharded model.

Assembles the shard_map training step (parallel/shard.py) into the same
mapper semantics as train/trainer.py: per iteration a *batch* of
``mesh.data`` keyframes (one per data group) is drawn from the times-of-use
sampler, gradients psum over the data axis, Adam runs on each Gaussian
shard, and densify/reset run per-shard at the reference cadence.

The single-GPU reference has no analog (SURVEY.md §2.11); this is the
BASELINE configs 4–5 path (view-sharded 1-host, Gaussians+views sharded
multi-host).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from omnigs_tpu.config import Config
from omnigs_tpu.model import optimizer as opt_ops
from omnigs_tpu.model.gaussians import from_pcd
from omnigs_tpu.ops.knn import mean_sq_knn_dist
from omnigs_tpu.ops.rasterize import RasterConfig
from omnigs_tpu.parallel.distributed import (
    data_batch,
    local_data_rows,
    make_global_mesh,
    replicate_from_host,
)
from omnigs_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS
from omnigs_tpu.parallel.shard import (
    make_sharded_densify,
    make_sharded_train_step,
)
from omnigs_tpu.scene.scene import KeyframeSampler, Scene


@dataclasses.dataclass
class ParallelTrainer:
    scene: Scene
    config: Config
    seed: int = 0

    def __post_init__(self):
        cfg = self.config
        # process-spanning mesh: with jax.distributed initialized this
        # covers every host's devices (data axis outermost → DCN)
        self.mesh = make_global_mesh(
            data=cfg.tpu.mesh_data, gauss=cfg.tpu.mesh_gauss
        )
        self.n_data = self.mesh.shape[DATA_AXIS]
        # data rows this process owns — the only rows whose GT images it
        # ever touches (host-local data loading)
        self.local_rows = local_data_rows(self.mesh)
        if self.scene.cameras:
            self.camera = next(iter(self.scene.cameras.values()))
        else:
            self.camera = next(iter(self.scene.keyframes.values())).camera
        _, self.cameras_extent = self.scene.nerfpp_norm()
        from omnigs_tpu.config import raster_config_from

        # single source of truth for Tpu.* → RasterConfig (ADVICE r1: this
        # previously hand-built an XLA-backend config, making the sharded
        # Pallas path unreachable from this entry point)
        self.raster_cfg = raster_config_from(cfg)
        self.lr_cfg = opt_ops.LRConfig(
            position_lr_init=cfg.opt.position_lr_init,
            position_lr_final=cfg.opt.position_lr_final,
            position_lr_delay_mult=cfg.opt.position_lr_delay_mult,
            position_lr_max_steps=cfg.opt.position_lr_max_steps,
            feature_lr=cfg.opt.feature_lr,
            opacity_lr=cfg.opt.opacity_lr,
            scaling_lr=cfg.opt.scaling_lr,
            rotation_lr=cfg.opt.rotation_lr,
        )
        self.bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
        self.sampler = KeyframeSampler(
            self.scene, cfg.mapper.new_keyframe_times_of_use, self.seed
        )
        self.iteration = 0
        self.ema_loss = 0.0
        self.last_loss = 0.0
        self.total_overflow = 0
        self.total_truncated = 0
        self._pending_losses = []
        self.key = jax.random.PRNGKey(self.seed)
        self._steps = {}
        self._densify = None
        self.model = None
        self.opt_state = None
        self._gt_cache = {}

    # -- setup --

    def init_from_sfm(self):
        pts = jnp.asarray(self.scene.points)
        cols = jnp.asarray(self.scene.colors)
        d2 = mean_sq_knn_dist(pts)
        model = from_pcd(pts, cols, self.config.tpu.capacity, d2)
        opt_state = opt_ops.init_adam(model.params())
        # every process builds the same initial state from the (replicated)
        # SfM cloud; placement goes through make_array_from_callback, which
        # unlike device_put accepts process-spanning shardings
        self.model = jax.tree_util.tree_map(
            lambda x: replicate_from_host(self.mesh, x, P(GAUSS_AXIS)), model
        )
        count = replicate_from_host(self.mesh, opt_state.count)
        self.opt_state = jax.tree_util.tree_map(
            lambda x: replicate_from_host(self.mesh, x, P(GAUSS_AXIS)),
            opt_state.replace(count=None),
        ).replace(count=count)

    @property
    def sh_degree(self) -> int:
        return min(self.iteration // 1000, self.config.model.sh_degree)

    def _step_fn(self, update_stats: bool, do_adam: bool):
        key = (self.sh_degree, update_stats, do_adam)
        if key not in self._steps:
            self._steps[key] = make_sharded_train_step(
                self.mesh,
                self.camera,
                sh_degree=self.sh_degree,
                cfg=self.raster_cfg,
                lr_cfg=self.lr_cfg,
                spatial_lr_scale=self.cameras_extent,
                bg=self.bg,
                lambda_dssim=self.config.opt.lambda_dssim,
                skip_bottom_px=(
                    int(
                        round(
                            self.camera.height
                            * self.config.opt.skip_bottom_ratio
                        )
                    )
                    if self.config.opt.skip_bottom_ratio > 0
                    else 0
                ),
                update_stats=update_stats,
                do_adam=do_adam,
            )
        return self._steps[key]

    def _gt(self, kf):
        if kf.fid not in self._gt_cache:
            self._gt_cache[kf.fid] = np.asarray(kf.image).transpose(2, 0, 1)
        return self._gt_cache[kf.fid]

    def train_iteration(self):
        cfg = self.config
        self.iteration += 1
        it = self.iteration
        vpg = cfg.tpu.views_per_group
        kfs = [self.sampler.sample() for _ in range(self.n_data * vpg)]

        in_densify_phase = it < cfg.opt.densify_until_iter
        do_densify = (
            in_densify_phase
            and it > cfg.opt.densify_from_iter
            and it % cfg.opt.densification_interval == 0
        )
        do_reset = in_densify_phase and (
            cfg.opt.opacity_reset_interval
            and it % cfg.opt.opacity_reset_interval == 0
        )

        # the sampler sequence is identical on every process (same seed);
        # each process materializes ONLY its own data rows — GT bytes never
        # cross hosts, gradients do (psum over the data axis)
        # row d of the (n_data·vpg)-long batch belongs to data group
        # d // vpg; this process materializes rows of its own groups only
        rows = [
            g * vpg + v for g in self.local_rows for v in range(vpg)
        ]
        vms = data_batch(
            self.mesh,
            np.stack([np.asarray(kfs[d].viewmatrix) for d in rows]),
        )
        cps = data_batch(
            self.mesh, np.stack([np.asarray(kfs[d].campos) for d in rows])
        )
        gts = data_batch(
            self.mesh, np.stack([self._gt(kfs[d]) for d in rows])
        )

        step = self._step_fn(
            update_stats=in_densify_phase,
            do_adam=not do_densify and it < cfg.opt.max_num_iterations,
        )
        self.model, self.opt_state, aux = step(
            self.model, self.opt_state, vms, cps, gts, np.int32(it)
        )
        loss = aux["loss"]

        if do_densify:
            if self._densify is None:
                size_threshold = (
                    20 if it > cfg.opt.prune_big_point_after_iter else 0
                )
                self._densify = make_sharded_densify(
                    self.mesh,
                    max_grad=cfg.opt.densify_grad_threshold,
                    min_opacity=cfg.opt.densify_min_opacity,
                    extent=self.cameras_extent,
                    max_screen_size=size_threshold,
                    percent_dense=cfg.opt.percent_dense,
                    prune_by_extent=cfg.opt.prune_by_extent,
                )
            self.key, sub = jax.random.split(self.key)
            self.model, self.opt_state, _ = self._densify(
                self.model, self.opt_state, np.asarray(sub), np.int32(it)
            )

        if do_reset:
            from omnigs_tpu.model.densify import reset_opacity

            self.model, self.opt_state = jax.jit(reset_opacity)(
                self.model, self.opt_state
            )

        # lazy loss fetch (see Trainer.drain_losses): a float() here would
        # sync the whole mesh every iteration
        self._pending_losses.append(
            (loss, aux["overflow"], aux["truncated"])
        )
        if len(self._pending_losses) > 512:
            self.drain_losses()
        return loss

    # -- sharded full-state checkpointing --

    def save_checkpoint(self, path):
        from omnigs_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(path, self.model, self.opt_state, self.iteration)

    def load_checkpoint(self, path):
        """Restore directly into the mesh layout (sharded orbax read)."""
        from omnigs_tpu.train.checkpoint import load_checkpoint

        self.model, self.opt_state, self.iteration, _ = load_checkpoint(
            path, self.config.tpu.capacity, mesh=self.mesh
        )

    def drain_losses(self) -> float:
        if self._pending_losses:
            pend, self._pending_losses = self._pending_losses, []
            for x, ov, tr in pend:
                v = float(x)
                self.last_loss = v
                self.ema_loss = 0.4 * v + 0.6 * self.ema_loss
                self.total_overflow += int(ov)
                self.total_truncated += int(tr)
            if self.total_truncated or self.total_overflow:
                import warnings

                warnings.warn(
                    "capacity pressure: "
                    f"{self.total_truncated} instances truncated / "
                    f"{self.total_overflow} overflowed so far — raise "
                    "Tpu.max_instances / Tpu.aligned_cap",
                    stacklevel=2,
                )
        return self.last_loss
